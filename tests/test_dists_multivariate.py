import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bayesianinference_tpu import dists as d


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_mvn_logpdf(rng, key):
    cov = _spd(rng, 4)
    mu = rng.normal(size=4)
    ours = d.MultivariateNormal(mean_=jnp.asarray(mu), cov=jnp.asarray(cov))
    ref = st.multivariate_normal(mu, cov)
    x = rng.normal(size=(10, 4)) * 3
    np.testing.assert_allclose(np.asarray(ours.log_prob(x)), ref.logpdf(x), rtol=1e-10)
    s = np.asarray(ours.sample(key, (100_000,)))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.05, atol=0.05)


def test_mvn_precision_consistent(rng, key):
    cov = _spd(rng, 3)
    mu = rng.normal(size=3)
    prec = np.linalg.inv(cov)
    a = d.MultivariateNormal(mean_=jnp.asarray(mu), cov=jnp.asarray(cov))
    b = d.MultivariateNormalPrecision(mean_=jnp.asarray(mu), precision=jnp.asarray(prec))
    x = rng.normal(size=(7, 3))
    np.testing.assert_allclose(
        np.asarray(a.log_prob(x)), np.asarray(b.log_prob(x)), rtol=1e-9
    )
    s = np.asarray(b.sample(key, (100_000,)))
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.05, atol=0.05)


def test_mvt_logpdf(rng, key):
    shape = _spd(rng, 3)
    mu = rng.normal(size=3)
    df = 5.0
    ours = d.MultivariateT(df=df, loc=jnp.asarray(mu), shape_matrix=jnp.asarray(shape))
    ref = st.multivariate_t(mu, shape, df)
    x = rng.normal(size=(10, 3)) * 2
    np.testing.assert_allclose(np.asarray(ours.log_prob(x)), ref.logpdf(x), rtol=1e-10)
    s = np.asarray(ours.sample(key, (200_000,)))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), shape * df / (df - 2), rtol=0.1, atol=0.1)


def test_mvt_reduces_to_studentt(rng):
    ours = d.MultivariateT(
        df=4.0, loc=jnp.asarray([1.0]), shape_matrix=jnp.asarray([[4.0]])
    )
    uni = d.StudentT(df=4.0, loc=1.0, scale=2.0)
    x = np.linspace(-5, 7, 21)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x[:, None])), np.asarray(uni.log_prob(x)), rtol=1e-10
    )


def test_matrix_normal(rng, key):
    u = _spd(rng, 3)
    v = _spd(rng, 2)
    m = rng.normal(size=(3, 2))
    ours = d.MatrixNormal(
        loc=jnp.asarray(m), row_cov=jnp.asarray(u), col_cov=jnp.asarray(v)
    )
    ref = st.matrix_normal(mean=m, rowcov=u, colcov=v)
    x = rng.normal(size=(5, 3, 2)) * 2
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), [ref.logpdf(xi) for xi in x], rtol=1e-10
    )
    # vec(X) covariance is V kron U
    s = np.asarray(ours.sample(key, (100_000,)))
    vecs = s.reshape(100_000, 6)  # row-major vec
    want = np.kron(u, v)
    np.testing.assert_allclose(np.cov(vecs.T), want, rtol=0.1, atol=0.1)


def test_wishart(rng, key):
    s_mat = _spd(rng, 3)
    df = 7.0
    ours = d.Wishart(df=df, scale=jnp.asarray(s_mat))
    ref = st.wishart(int(df), s_mat)
    xs = ref.rvs(size=8, random_state=np.random.default_rng(1))
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(xs))), ref.logpdf(np.moveaxis(xs, 0, -1)),
        rtol=1e-9,
    )
    samples = np.asarray(ours.sample(key, (20_000,)))
    np.testing.assert_allclose(samples.mean(0), df * s_mat, rtol=0.05, atol=0.1)


def test_inverse_wishart(rng, key):
    psi = _spd(rng, 3)
    df = 8.0
    ours = d.InverseWishart(df=df, scale=jnp.asarray(psi))
    ref = st.invwishart(int(df), psi)
    xs = ref.rvs(size=8, random_state=np.random.default_rng(1))
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(xs))), ref.logpdf(np.moveaxis(xs, 0, -1)),
        rtol=1e-9,
    )
    samples = np.asarray(ours.sample(key, (20_000,)))
    np.testing.assert_allclose(
        samples.mean(0), psi / (df - 3 - 1), rtol=0.1, atol=0.1
    )


def test_matrix_t_consistency(rng, key):
    """MatrixT with p=1 column must reduce to a MultivariateT."""
    u = _spd(rng, 3)
    m = rng.normal(size=(3, 1))
    df = 6.0
    v = np.array([[2.0]])
    ours = d.MatrixT(
        df=df, loc=jnp.asarray(m), row_cov=jnp.asarray(u), col_cov=jnp.asarray(v)
    )
    # Gupta & Nagar: X ~ T(df, M, U, V) with p=1 <=> MVT(df, M, U * V / 1)
    mvt = d.MultivariateT(
        df=df, loc=jnp.asarray(m[:, 0]), shape_matrix=jnp.asarray(u * v[0, 0] / df)
    )
    x = rng.normal(size=(6, 3, 1))
    got = np.asarray(ours.log_prob(x))
    want = np.asarray(mvt.log_prob(x[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mvgammaln():
    from scipy.special import multigammaln

    for dim in (1, 2, 4):
        got = float(d.mvgammaln(jnp.asarray(5.3), dim))
        np.testing.assert_allclose(got, multigammaln(5.3, dim), rtol=1e-12)


def test_dirichlet_logpdf_and_moments(rng, key):
    alpha = np.asarray([2.0, 3.5, 1.2, 4.0])
    ours = d.Dirichlet(alpha=jnp.asarray(alpha))
    ref = st.dirichlet(alpha)
    x = rng.dirichlet(alpha, size=12)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpdf(x.T), rtol=1e-9
    )
    s = np.asarray(ours.sample(key, (100_000,)))
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(s.mean(0), alpha / alpha.sum(), atol=0.01)
    np.testing.assert_allclose(
        s.var(0), np.asarray(ours.variance()), rtol=0.05
    )
    # off-simplex points get the sentinel, not NaN
    bad = np.asarray([[0.5, 0.5, 0.5, 0.5], [-0.1, 0.4, 0.4, 0.3]])
    assert np.all(np.asarray(ours.log_prob(bad)) < -1e25)


def test_multinomial_logpmf_and_moments(rng, key):
    n, p = 20.0, np.asarray([0.2, 0.5, 0.3])
    ours = d.Multinomial(n=jnp.asarray(n), p=jnp.asarray(p))
    x = rng.multinomial(int(n), p, size=15).astype(float)
    ref = st.multinomial(int(n), p)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpmf(x), rtol=1e-9
    )
    s = np.asarray(ours.sample(key, (50_000,)))
    assert np.all(s.sum(-1) == n)
    np.testing.assert_allclose(s.mean(0), n * p, rtol=0.02)
    # wrong total or negative counts get the sentinel
    bad = np.asarray([[5.0, 5.0, 5.0], [21.0, -1.0, 0.0]])
    assert np.all(np.asarray(ours.log_prob(bad)) < -1e25)


def test_categorical_logpmf_sampling(rng, key):
    from bayesianinference_tpu.dists.scalar import Categorical

    logits = np.asarray([0.3, -1.2, 2.0, 0.0])
    p = np.exp(logits) / np.exp(logits).sum()
    ours = Categorical(logits=jnp.asarray(logits))
    x = np.arange(4.0)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), np.log(p), rtol=1e-6
    )
    # out-of-range and non-integer -> sentinel
    assert np.all(np.asarray(ours.log_prob(np.asarray([-1.0, 4.0, 1.5]))) < -1e25)
    s = np.asarray(ours.sample(key, (100_000,)))
    freq = np.bincount(s.astype(int), minlength=4) / len(s)
    np.testing.assert_allclose(freq, p, atol=0.01)
    np.testing.assert_allclose(float(ours.mean()), (np.arange(4) * p).sum(), rtol=1e-6)


def test_categorical_batched_logits(rng):
    from bayesianinference_tpu.dists.scalar import Categorical

    logits = rng.normal(size=(6, 3))
    ours = Categorical(logits=jnp.asarray(logits))
    x = rng.integers(0, 3, size=6).astype(float)
    lp = np.asarray(ours.log_prob(x))
    expected = np.stack(
        [
            st.multinomial(1, np.exp(l) / np.exp(l).sum()).logpmf(
                np.eye(3)[int(i)]
            )
            for l, i in zip(logits, x)
        ]
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-6)


def test_batched_samplers_draw_independent_noise(key):
    """Param-batched multivariate samplers must draw INDEPENDENT noise per
    batch element: a z of shape (event,) broadcast against [B, ...] params
    silently reuses ONE draw across the whole batch (the PointwiseMixture
    vector-predictive bug, round 3).  Check pairwise decorrelation and the
    per-element mean for each family."""
    B = 256
    zero2 = jnp.zeros((B, 2))
    eye2 = jnp.broadcast_to(jnp.eye(2), (B, 2, 2))

    def assert_independent(samples, atol_mean=0.15):
        s = np.asarray(samples).reshape(B, -1)[:, 0]
        assert s.std() > 0.1  # not one shared draw
        # adjacent batch elements uncorrelated
        r = np.corrcoef(s[0::2][: B // 2 - 1], s[1::2][: B // 2 - 1])[0, 1]
        assert abs(r) < 0.2, r
        assert abs(s.mean()) < atol_mean or s.mean() > 0  # sanity

    assert_independent(d.MultivariateNormal(zero2, eye2).sample(key))
    assert_independent(
        d.MultivariateNormalPrecision(zero2, eye2).sample(key)
    )
    assert_independent(
        d.MultivariateT(
            df=jnp.full((B,), 7.0), loc=zero2, shape_matrix=eye2
        ).sample(key)
    )
    assert_independent(
        d.MatrixNormal(
            jnp.zeros((B, 2, 3)),
            row_cov=eye2,
            col_cov=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        ).sample(key)
    )
    assert_independent(
        d.MatrixT(
            df=jnp.full((B,), 6.0),
            loc=jnp.zeros((B, 2, 3)),
            row_cov=eye2,
            col_cov=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        ).sample(key)
    )
    w = d.Wishart(df=jnp.full((B,), 9.0), scale=eye2 * 0.5).sample(key)
    assert w.shape == (B, 2, 2)
    # E[X] = df * S = 4.5 I; off-diagonal decorrelated across batch
    np.testing.assert_allclose(
        np.asarray(w)[:, 0, 0].mean(), 4.5, rtol=0.15
    )
    assert_independent(w[:, 0, 1] / 2.0)
    iw = d.InverseWishart(df=jnp.full((B,), 9.0), scale=eye2 * 6.0).sample(key)
    assert iw.shape == (B, 2, 2)
    # E[X] = Psi/(df - d - 1) = I
    np.testing.assert_allclose(
        np.asarray(iw)[:, 0, 0].mean(), 1.0, rtol=0.2
    )
    assert_independent(iw[:, 0, 1] * 2.0)
    # shape arg follows the scalar families' broadcast-pairing convention:
    # shape == batch pairs one draw per element; leading axes replicate
    s = d.MultivariateNormal(zero2, eye2).sample(key, (B,))
    assert s.shape == (B, 2)
    s = d.MultivariateNormal(zero2, eye2).sample(key, (5, B))
    assert s.shape == (5, B, 2)
    # replicated draws across the leading axis are independent
    assert abs(np.corrcoef(np.asarray(s)[0, :, 0],
                           np.asarray(s)[1, :, 0])[0, 1]) < 0.2


def test_matrix_t_batched_scale_draws_independent(key):
    """MatrixT sampling uses the inverse-Wishart mixture representation;
    the scale draw must be independent PER batch element (a scale drawn
    with the request shape alone is silently shared across a param
    batch, suppressing the heavy-tail between-sample variability)."""
    B, df = 300, 3.0
    loc = jnp.zeros((B, 2, 2))
    mt_batched = d.MatrixT(
        df=df, loc=loc, row_cov=jnp.eye(2), col_cov=jnp.eye(2)
    )
    s_batch = np.asarray(mt_batched.sample(key))  # one call, B elements
    ln_batch = np.log(np.linalg.norm(s_batch.reshape(B, -1), axis=1))

    mt_single = d.MatrixT(
        df=df, loc=jnp.zeros((2, 2)), row_cov=jnp.eye(2), col_cov=jnp.eye(2)
    )
    s_indep = np.asarray(
        jax.vmap(lambda k: mt_single.sample(k))(jax.random.split(key, B))
    )
    ln_indep = np.log(np.linalg.norm(s_indep.reshape(B, -1), axis=1))

    # heavy-tail dispersion of log-norms must match the fully independent
    # draws (a shared scale collapses the within-call dispersion)
    assert ln_batch.std() > 0.6 * ln_indep.std(), (
        ln_batch.std(), ln_indep.std(),
    )
