import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.bnn import (
    alpha_divergence_loss,
    gaussian_loss,
    net_regularization_loss,
    network_log_evidence,
    regression_net,
    regression_loss,
    sample_trained_net,
    train_regression_net,
)


def test_gaussian_loss_parameterizations():
    y, yp = 1.0, 1.5
    v = 0.7
    # all three parameterizations agree up to the shared constant
    lp = float(gaussian_loss(y, yp, np.log(1 / v), "LogPrecision"))
    lv = float(gaussian_loss(y, yp, v, "Variance"))
    ls = float(gaussian_loss(y, yp, np.sqrt(v), "StandardDeviation"))
    np.testing.assert_allclose(lp, 0.25 / v + np.log(v), rtol=1e-12)
    np.testing.assert_allclose(lv, lp, rtol=1e-12)
    np.testing.assert_allclose(ls, lp, rtol=1e-12)


def test_alpha_divergence_limits(rng):
    losses = jnp.asarray(rng.normal(size=20))
    np.testing.assert_allclose(
        float(alpha_divergence_loss(losses, 0)), float(losses.mean()), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(alpha_divergence_loss(losses, jnp.inf)), float(losses.min())
    )
    np.testing.assert_allclose(
        float(alpha_divergence_loss(losses, -jnp.inf)), float(losses.max())
    )
    # alpha -> 0 limit is continuous
    np.testing.assert_allclose(
        float(alpha_divergence_loss(losses, 1e-6)),
        float(losses.mean()),
        atol=1e-4,
    )
    # larger alpha weights low losses more
    assert float(alpha_divergence_loss(losses, 2.0)) < float(losses.mean())


def test_regularization_loss():
    params = {"a": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([[3.0]])}
    np.testing.assert_allclose(
        float(net_regularization_loss(params, 0.5, 2)), 0.5 * (1 + 4 + 9)
    )
    np.testing.assert_allclose(float(net_regularization_loss(params, 1.0, 0)), 3.0)
    np.testing.assert_allclose(
        float(net_regularization_loss(params, [0.5, 1.0], [2, 0])),
        0.5 * 14 + 3.0,
    )


@pytest.mark.slow
def test_bnn_end_to_end(key):
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(256, 1)).astype(np.float32)
    y = np.sin(2 * x[:, 0]) + 0.1 * rng.normal(size=256).astype(np.float32)

    net = regression_net(depth=2, layer_size=48, dropout_probability=0.1)
    trained = train_regression_net(
        net, key, jnp.asarray(x), jnp.asarray(y),
        alpha=0.5, sample_number=5, num_steps=1500, learning_rate=3e-3,
    )
    params, history = trained.params, trained.history
    assert float(history[-100:].mean()) < float(history[:100].mean())

    xq = np.linspace(-1.8, 1.8, 31)[:, None].astype(np.float32)
    pred = sample_trained_net(net, params, jax.random.PRNGKey(1), jnp.asarray(xq),
                              num_samples=200)
    mean = np.asarray(pred.mean())
    std = np.asarray(pred.std())
    truth = np.sin(2 * xq[:, 0])
    assert np.mean(np.abs(mean - truth)) < 0.2
    assert np.all(std > 0.03)  # at least the aleatoric noise
    # coverage: most truths within 3 predictive sigma
    assert np.mean(np.abs(mean - truth) < 3 * std) > 0.9

    # network log evidence is finite and improves with a trained net;
    # the bundle form AUTO-extracts alpha from training (NN:361-374)
    lz_trained = float(
        network_log_evidence(net, params, key, jnp.asarray(x), jnp.asarray(y),
                             lambda2=0.0, alpha=0.5, sample_number=20)
    )
    lz_auto = float(
        network_log_evidence(trained, key, jnp.asarray(x), jnp.asarray(y),
                             sample_number=20)
    )
    assert np.isfinite(lz_auto)
    params0 = net.init({"params": key, "dropout": key}, jnp.asarray(x[:1]),
                       deterministic=True)
    lz_init = float(
        network_log_evidence(net, params0, key, jnp.asarray(x), jnp.asarray(y),
                             lambda2=0.0, alpha=0.5, sample_number=20)
    )
    assert np.isfinite(lz_trained) and lz_trained > lz_init


def test_homoscedastic_head(key):
    net = regression_net("HomoScedastic", depth=1, layer_size=8,
                         dropout_probability=0.0)
    x = jnp.zeros((4, 1))
    params = net.init({"params": key, "dropout": key}, x, deterministic=True)
    out = net.apply(params, x, deterministic=True)
    assert out.shape == (4, 2)
    # constant log-precision: same value for every example
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(out[0, 1]))


def test_batchnorm_variant(key):
    net = regression_net(depth=2, layer_size=16, batch_normalization=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)), jnp.float32)
    variables = net.init({"params": key, "dropout": key}, x, deterministic=True)
    out, updates = net.apply(
        variables, x, deterministic=False, rngs={"dropout": key},
        mutable=["batch_stats"],
    )
    assert out.shape == (8, 2)
    assert "batch_stats" in updates
