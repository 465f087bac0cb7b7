"""Flow vocoder tests: invertibility, likelihood math, training signal."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import waveglow as wg

# Small config: same topology (12 flows would be slow on CPU; 6 flows with
# early output at 2 and 4 still exercises the early-output plumbing).
CFG = wg.WaveGlowConfig(
    n_mel_channels=8, n_flows=6, n_group=8, n_early_every=2, n_early_size=2,
    wn_layers=3, wn_channels=16, upsample_kernel=16, upsample_stride=4)


@pytest.fixture(scope="module")
def setup():
    params = wg.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    B, T_mel = 2, 12
    mel = jnp.asarray(rng.randn(B, T_mel, CFG.n_mel_channels), jnp.float32)
    audio = jnp.asarray(
        rng.randn(B, T_mel * CFG.upsample_stride) * 0.3, jnp.float32)
    return params, mel, audio


class TestFlows:
    def test_forward_shapes(self, setup):
        params, mel, audio = setup
        out = wg.forward(params, audio, mel, CFG)
        t_groups = mel.shape[1] * CFG.upsample_stride // CFG.n_group
        assert out.z.shape == (2, t_groups, CFG.n_group)

    def test_zero_init_flows_are_identity_coupling(self, setup):
        """wn_end is zero-init, so at init log_s=0, t=0: z is just the
        composition of the 1x1 convs (volume-preserving up to det)."""
        params, mel, audio = setup
        out = wg.forward(params, audio, mel, CFG)
        assert float(out.log_s_total) == 0.0
        # orthogonal init: |det| = 1 -> log det == 0
        np.testing.assert_allclose(float(out.log_det_total), 0.0, atol=1e-3)

    def test_invertibility(self, setup):
        """infer(forward(audio)) must reproduce audio exactly — the core
        flow property, valid for ANY params. We bypass sampling by feeding
        the forward z through the inverse path manually."""
        params, mel, audio = setup

        out = wg.forward(params, audio, mel, CFG)

        # monkey-run infer with z fixed to the forward output
        def infer_with_z(z):
            cond = wg.upsample_mel(params, mel, CFG)
            early_flows = [i for i in range(CFG.n_flows)
                           if i % CFG.n_early_every == 0 and i > 0]
            n_early = len(early_flows)
            chunks = [z[..., k * CFG.n_early_size:(k + 1) * CFG.n_early_size]
                      for k in range(n_early)]
            x = z[..., n_early * CFG.n_early_size:]
            for i in reversed(range(CFG.n_flows)):
                flow = params["flows"][i]
                half = x.shape[-1] // 2
                xa, xb = x[..., :half], x[..., half:]
                ls_t = wg.wn_conditioner(flow["wn"], xa, cond, CFG)
                t, log_s = ls_t[..., :half], ls_t[..., half:]
                xb = (xb - t) * jnp.exp(-log_s)
                x = jnp.concatenate([xa, xb], axis=-1)
                x = wg._inv1x1_inverse(flow["inv1x1"]["w"], x)
                if i % CFG.n_early_every == 0 and i > 0:
                    x = jnp.concatenate([chunks[early_flows.index(i)], x],
                                        axis=-1)
            return x.reshape(z.shape[0], -1)

        recovered = infer_with_z(out.z)
        t = recovered.shape[1]
        np.testing.assert_allclose(np.asarray(recovered),
                                   np.asarray(audio[:, :t]), atol=1e-4)

    def test_invertibility_after_perturbation(self, setup):
        """Still invertible with non-identity couplings (perturbed params)."""
        params, mel, audio = setup
        params = jax.tree.map(
            lambda x: x + 0.01 * np.random.RandomState(1).randn(*x.shape)
            .astype(np.float32), params)
        out = wg.forward(params, audio, mel, CFG)
        assert float(jnp.abs(out.log_s_total)) > 0  # couplings active

        # use infer()'s plumbing by injecting z via the key-free path:
        # reconstruct manually as above
        cond = wg.upsample_mel(params, mel, CFG)
        z = out.z
        early_flows = [i for i in range(CFG.n_flows)
                       if i % CFG.n_early_every == 0 and i > 0]
        chunks = [z[..., k * CFG.n_early_size:(k + 1) * CFG.n_early_size]
                  for k in range(len(early_flows))]
        x = z[..., len(early_flows) * CFG.n_early_size:]
        for i in reversed(range(CFG.n_flows)):
            flow = params["flows"][i]
            half = x.shape[-1] // 2
            xa, xb = x[..., :half], x[..., half:]
            ls_t = wg.wn_conditioner(flow["wn"], xa, cond, CFG)
            t, log_s = ls_t[..., :half], ls_t[..., half:]
            xb = (xb - t) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
            x = wg._inv1x1_inverse(flow["inv1x1"]["w"], x)
            if i % CFG.n_early_every == 0 and i > 0:
                x = jnp.concatenate([chunks[early_flows.index(i)], x], axis=-1)
        recovered = x.reshape(2, -1)
        np.testing.assert_allclose(np.asarray(recovered),
                                   np.asarray(audio[:, :recovered.shape[1]]),
                                   atol=1e-3)

    @pytest.mark.slow
    def test_logdet_matches_autodiff_jacobian(self):
        """For a tiny flow, log|det dz/dx| from the code must equal the
        autodiff Jacobian determinant."""
        cfg = wg.WaveGlowConfig(n_mel_channels=4, n_flows=2, n_group=4,
                                n_early_every=4, n_early_size=0, wn_layers=2,
                                wn_channels=8, upsample_kernel=4,
                                upsample_stride=2)
        params = wg.init_params(jax.random.PRNGKey(3), cfg)
        params = jax.tree.map(
            lambda x: x + 0.05 * np.random.RandomState(2).randn(*x.shape)
            .astype(np.float32), params)
        rng = np.random.RandomState(0)
        mel = jnp.asarray(rng.randn(1, 4, 4), jnp.float32)
        audio = jnp.asarray(rng.randn(1, 8) * 0.3, jnp.float32)

        def z_of_audio(a):
            return wg.forward(params, a[None], mel, cfg).z.reshape(-1)

        J = jax.jacobian(z_of_audio)(audio[0])
        _, expected_logdet = np.linalg.slogdet(np.asarray(J))
        out = wg.forward(params, audio, mel, cfg)
        got = float(out.log_s_total + out.log_det_total)
        np.testing.assert_allclose(got, expected_logdet, rtol=1e-3, atol=1e-3)


class TestTrainingAndInference:
    def test_loss_finite_and_decreases(self, setup):
        params, mel, audio = setup
        import optax
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return wg.loss(wg.forward(p, audio, mel, CFG), sigma=1.0)
            l, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, l

        first = None
        for i in range(30):
            params, opt_state, l = step(params, opt_state)
            if first is None:
                first = float(l)
        assert np.isfinite(float(l))
        assert float(l) < first

    def test_infer_shape_and_determinism(self, setup):
        params, mel, _ = setup
        audio = wg.infer(params, mel, CFG, sigma=0.6,
                         key=jax.random.PRNGKey(1))
        assert audio.shape == (2, mel.shape[1] * CFG.upsample_stride)
        audio2 = wg.infer(params, mel, CFG, sigma=0.6,
                          key=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(audio), np.asarray(audio2))

    @pytest.mark.slow
    def test_full_size_param_count(self):
        """Full config lands in the WaveGlow ballpark (~87M at 256ch/12
        flows; ours differs slightly by per-layer cond convs)."""
        params = wg.init_params(jax.random.PRNGKey(0), wg.WaveGlowConfig())
        n = sum(x.size for x in jax.tree.leaves(params))
        assert 60e6 < n < 200e6
