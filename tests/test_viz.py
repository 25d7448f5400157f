import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.engines import nested_sampling
from bayesianinference_tpu.results import regression_predictive_distribution
from bayesianinference_tpu import viz


@pytest.fixture
def ns_result(regression_ns):
    # the session-scoped standard regression run (tests/conftest.py)
    return regression_ns


def test_all_plots_render(ns_result, tmp_path):
    problem, res, x, y = ns_result
    figs = {
        "cov": viz.covariance_matrix_plot(res),
        "pdf1d": viz.posterior_marginal_pdf_plot_1d(res, 0),
        "cdf1d": viz.posterior_marginal_cdf_plot_1d(res, 0),
        "pdf2d": viz.posterior_marginal_pdf_density_plot_2d(res, (0, 1)),
        "cdf2d": viz.posterior_marginal_cdf_density_plot_2d(res, (0, 1), num_points=20),
        "bubble": viz.posterior_bubble_chart(res, (0, 1)),
        "bubble3d": viz.posterior_bubble_chart(res, (0, 1, 2)),
        "report": viz.calculation_report_plot(res),
    }
    xq = jnp.linspace(-2, 2, 15)
    pred = regression_predictive_distribution(
        res, lambda th, xx: d.Normal(th[0] * xx[:, 0] + th[1], th[2]), xq[:, None]
    )
    figs["regression"] = viz.regression_plot_1d(
        res, pred, xq, x_data=x, y_data=y
    )
    figs["regression_moments"] = viz.regression_plot_1d(
        res, pred, xq, x_data=x, y_data=y, moments=True
    )
    for name, fig in figs.items():
        out = tmp_path / f"{name}.png"
        fig.savefig(out, dpi=50)
        assert out.stat().st_size > 1000, name
    import matplotlib.pyplot as plt

    plt.close("all")


def test_trace_plot_renders(rng):
    from bayesianinference_tpu.viz import trace_plot

    chains = rng.normal(size=(3, 400, 2))
    fig = trace_plot(chains, param_names=("a", "b"))
    assert len(fig.axes) == 4  # 2 params x (trace, autocorr)
    # ESS/R-hat annotations present
    titles = [ax.get_title() for ax in fig.axes]
    assert any("ESS" in t and "R-hat" in t for t in titles)
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_smc_report_plot(key):
    from bayesianinference_tpu.engines import smc_sampler
    from bayesianinference_tpu.viz import smc_report_plot

    problem = define_inference_problem(
        parameters=[("x", -5.0, 5.0), ("y", -5.0, 5.0)],
        log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
        prior_distribution=["location", "location"],
        validate=False,
    )
    r = smc_sampler(problem, key, n_particles=120, num_runs=3, mcmc_steps=5)
    fig = smc_report_plot(r)
    assert len(fig.axes) == 3
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_calibration_plot_renders():
    import numpy as np

    from bayesianinference_tpu.dists.pointwise import PointwiseMixture
    from bayesianinference_tpu.dists.scalar import Normal
    from bayesianinference_tpu.viz import calibration_plot

    rng = np.random.default_rng(0)
    m = 300
    mu = jnp.asarray(rng.normal(size=m))
    s = jnp.asarray(rng.uniform(0.5, 1.5, size=m))
    y = jnp.asarray(rng.normal(np.asarray(mu), np.asarray(s)))
    mix = PointwiseMixture(
        log_weights=jnp.zeros(1), component=Normal(mu[None, :], s[None, :])
    )
    fig = calibration_plot(mix, y)
    assert len(fig.axes) == 3
    import matplotlib.pyplot as plt

    plt.close(fig)
