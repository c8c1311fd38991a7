"""Golden tests: Pallas fused loss kernel vs the XLA reference implementation.

Runs in Pallas interpreter mode on the CPU test mesh (the kernel selects
interpret automatically off-TPU); the same kernels compile on real TPU via
the dispatcher. Forward AND backward (custom VJP) must match XLA within
float32 tolerance, including log-Q correction, accidental-hit masking, and
zero-weight padding rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.ops import losses, pallas_kernels


def _inputs(rng, batch, dim, num_items=1000, dup=False):
    u = rng.normal(size=(batch, dim)).astype(np.float32)
    v = rng.normal(size=(batch, dim)).astype(np.float32)
    idx = rng.choice(num_items, size=batch, replace=False).astype(np.int32)
    if dup:
        idx[1] = idx[0]
        idx[7] = idx[0]
    log_q = np.log(rng.uniform(0.001, 0.1, size=num_items)).astype(np.float32)
    w = np.ones(batch, np.float32)
    w[-3:] = 0.0
    return (
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
        jnp.asarray(log_q), jnp.asarray(w),
    )


@pytest.mark.parametrize("batch", [256, 512])
@pytest.mark.parametrize("dup", [False, True])
def test_forward_matches_xla(rng, batch, dup):
    u, v, idx, log_q, w = _inputs(rng, batch, 128, dup=dup)
    ref_loss, ref_m = losses.in_batch_softmax_loss(
        u, v, idx, temperature=0.1, log_q=log_q, weights=w
    )
    pal_loss, pal_m = pallas_kernels.fused_in_batch_softmax_loss(
        u, v, idx, temperature=0.1, log_q=log_q, weights=w
    )
    np.testing.assert_allclose(float(pal_loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(
        float(pal_m["accuracy"]), float(ref_m["accuracy"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(pal_m["logits_mean"]), float(ref_m["logits_mean"]), rtol=1e-3, atol=1e-4
    )


def test_forward_no_logq_no_weights(rng):
    u, v, idx, _, _ = _inputs(rng, 256, 128)
    ref_loss, _ = losses.in_batch_softmax_loss(u, v, idx, temperature=0.5)
    pal_loss, _ = pallas_kernels.fused_in_batch_softmax_loss(u, v, idx, temperature=0.5)
    np.testing.assert_allclose(float(pal_loss), float(ref_loss), rtol=1e-4)


@pytest.mark.parametrize("dup", [False, True])
def test_backward_matches_xla(rng, dup):
    u, v, idx, log_q, w = _inputs(rng, 256, 128, dup=dup)

    def ref_fn(u, v):
        return losses.in_batch_softmax_loss(
            u, v, idx, temperature=0.1, log_q=log_q, weights=w
        )[0]

    def pal_fn(u, v):
        return pallas_kernels.fused_in_batch_softmax_loss(
            u, v, idx, temperature=0.1, log_q=log_q, weights=w
        )[0]

    ref_du, ref_dv = jax.grad(ref_fn, argnums=(0, 1))(u, v)
    pal_du, pal_dv = jax.grad(pal_fn, argnums=(0, 1))(u, v)
    np.testing.assert_allclose(np.asarray(pal_du), np.asarray(ref_du), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_dv), np.asarray(ref_dv), rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("off,rows", [(0, 256), (256, 256)])
def test_block_kernel_matches_xla_block(rng, off, rows):
    """Sharded form: local user rows at a global offset vs full-batch
    columns — forward and VJP must match the XLA block twin."""
    u, v, idx, log_q, w = _inputs(rng, 512, 128, dup=True)
    u_loc = u[off : off + rows]

    ref_pe, ref_c, ref_rd = losses.in_batch_softmax_block(
        u_loc, v, idx, off, temperature=0.1, log_q=log_q, weights_all=w
    )
    pal_pe, pal_c, pal_rd = pallas_kernels.fused_in_batch_softmax_block(
        u_loc, v, idx, off, temperature=0.1, log_q=log_q, weights_all=w
    )
    w_loc = np.asarray(w)[off : off + rows]
    live = w_loc > 0  # padding rows' per-row values are unweighted garbage
    np.testing.assert_allclose(
        np.asarray(pal_pe)[live], np.asarray(ref_pe)[live], rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(pal_c)[live], np.asarray(ref_c)[live])
    np.testing.assert_allclose(
        np.asarray(pal_rd)[live], np.asarray(ref_rd)[live], rtol=1e-3, atol=1e-4
    )

    wj = jnp.asarray(np.where(live, w_loc, 0.0), jnp.float32)

    def ref_fn(u_loc, v):
        pe, _, _ = losses.in_batch_softmax_block(
            u_loc, v, idx, off, temperature=0.1, log_q=log_q, weights_all=w
        )
        return jnp.sum(pe * wj)

    def pal_fn(u_loc, v):
        pe, _, _ = pallas_kernels.fused_in_batch_softmax_block(
            u_loc, v, idx, off, temperature=0.1, log_q=log_q, weights_all=w
        )
        return jnp.sum(pe * wj)

    ref_du, ref_dv = jax.grad(ref_fn, argnums=(0, 1))(u_loc, v)
    pal_du, pal_dv = jax.grad(pal_fn, argnums=(0, 1))(u_loc, v)
    # atol covers f32 accumulation-order noise over the 512-wide lse/exp.
    np.testing.assert_allclose(np.asarray(pal_du), np.asarray(ref_du), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pal_dv), np.asarray(ref_dv), rtol=5e-3, atol=5e-4)


def test_supported_shapes():
    assert pallas_kernels.supported_for(4096, 128)
    assert not pallas_kernels.supported_for(100, 128)  # batch not multiple
    assert not pallas_kernels.supported_for(16384, 128)  # too big
    assert not pallas_kernels.supported_for(256, 96)  # dim not lane multiple
    assert not pallas_kernels.supported_for(8192, 512)  # VMEM budget


def test_dispatch_falls_back_off_tpu(rng):
    from twotower_tpu.ops.dispatch import in_batch_softmax_loss_auto

    u, v, idx, log_q, w = _inputs(rng, 256, 128)
    loss, _ = in_batch_softmax_loss_auto(
        u, v, idx, temperature=0.1, log_q=log_q, weights=w
    )
    ref, _ = losses.in_batch_softmax_loss(
        u, v, idx, temperature=0.1, log_q=log_q, weights=w
    )
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
