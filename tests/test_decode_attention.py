"""Ragged Pallas decode attention vs the XLA reference (interpret mode;
verified compiled on TPU separately)."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.ops.decode_attention import (
    ragged_decode_attention,
    ragged_decode_attention_xla,
)


@pytest.mark.parametrize("valid", [[100, 512, 257], [1, 3, 512], [512, 512, 512]])
def test_ragged_decode_attention_matches_xla(rng, valid):
    B, H, cap, Dh = 3, 4, 512, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray(valid, np.int32)
    want = np.asarray(
        ragged_decode_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl))
    )
    got = np.asarray(
        ragged_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl),
            blk=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ragged_decode_attention_bf16_cache(rng):
    B, H, cap, Dh = 2, 2, 256, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, cap, Dh)), jnp.bfloat16)
    vl = jnp.asarray([100, 256], jnp.int32)
    want = np.asarray(ragged_decode_attention_xla(jnp.asarray(q), k, v, vl))
    got = np.asarray(
        ragged_decode_attention(jnp.asarray(q), k, v, vl, blk=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("valid", [[100, 512, 257], [512, 1, 128]])
def test_ragged_decode_attention_transposed(rng, valid):
    """Transposed-cache variant (the TPU-compilable layout: token slices on
    the 128-lane axis); verified compiled+bit-correct on real TPU."""
    from indextts_tpu.ops.decode_attention import ragged_decode_attention_t

    B, H, cap, Dh = 3, 4, 512, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray(valid, np.int32)
    want = np.asarray(
        ragged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl)
        )
    )
    got = np.asarray(
        ragged_decode_attention_t(
            jnp.asarray(q),
            jnp.asarray(k.transpose(0, 1, 3, 2)),
            jnp.asarray(v.transpose(0, 1, 3, 2)),
            jnp.asarray(vl),
            blk=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
