"""Fused LayerNorm kernel (interpret mode): value + gradient parity against
flax nn.LayerNorm, and model-level equivalence of the config flag."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from few_shot_transformer_tts_tpu.ops.fused_layernorm import fused_layer_norm


def _ref_ln(x, gamma, beta, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * gamma
            + beta).astype(x.dtype)


def test_value_and_grad_parity():
    rng = np.random.RandomState(0)
    for shape in [(4, 12, 64), (3, 130), (2, 700, 48)]:
        x = jnp.asarray(rng.randn(*shape) * 2.0 + 0.5, jnp.float32)
        gamma = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.randn(shape[-1]) * 0.1, jnp.float32)
        w = jnp.asarray(rng.randn(*shape), jnp.float32)

        def loss_fused(x, g, b):
            return jnp.sum(fused_layer_norm(x, g, b, 1e-6, True) * w)

        def loss_ref(x, g, b):
            return jnp.sum(_ref_ln(x, g, b) * w)

        y1 = fused_layer_norm(x, gamma, beta, 1e-6, True)
        y2 = _ref_ln(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-5, err_msg=str(shape))
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b, name in zip(g1, g2, ["dx", "dgamma", "dbeta"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg="%s %s" % (name, shape))


def test_matches_flax_layernorm():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 20, 96), jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6)
    params = ln.init(jax.random.PRNGKey(0), x)
    y_flax = ln.apply(params, x)
    y_fused = fused_layer_norm(x, params["params"]["scale"],
                               params["params"]["bias"], 1e-6, True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_flax),
                               atol=1e-5)


def test_model_flag_equivalence():
    """hp.use_fused_layernorm must not change the model computation: same
    param tree, same loss, same grads (CPU interpret path)."""
    from few_shot_transformer_tts_tpu.config import small_test_config
    from few_shot_transformer_tts_tpu.models.tacotron import ByteToMel, \
        compute_loss

    rng = np.random.RandomState(2)
    b, t_in, t_out = 2, 16, 16
    hp0 = small_test_config()
    batch = {
        "inputs": jnp.asarray(rng.randint(3, 100, (b, t_in)), jnp.int32),
        "input_lengths": jnp.asarray([t_in, t_in - 4], jnp.int32),
        "mel_targets": jnp.asarray(rng.randn(b, t_out, hp0.num_mels),
                                   jnp.float32),
        "target_lengths": jnp.asarray([t_out, t_out - 6], jnp.int32),
        "input_spk_ids": jnp.zeros((b,), jnp.int32),
        "input_language_vecs": jnp.eye(hp0.max_num_language,
                                       dtype=np.float32)[:b],
    }

    losses = {}
    params_trees = {}
    for fused in (False, True):
        hp = hp0.replace(use_fused_layernorm=fused)
        model = ByteToMel(hp)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, **batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"], **batch)
            return compute_loss(params, batch["mel_targets"],
                                batch["target_lengths"], out, hp)["loss"]

        losses[fused] = float(loss_fn(variables["params"]))
        params_trees[fused] = jax.tree.structure(variables["params"])
    assert params_trees[False] == params_trees[True]
    np.testing.assert_allclose(losses[False], losses[True], rtol=2e-5)
