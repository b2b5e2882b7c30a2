"""Fused Pallas anti-alias snake kernel vs the XLA reference path
(interpret mode on CPU; verified bit-exact compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.ops.snake import anti_alias_snake
from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas


@pytest.mark.parametrize(
    "T,C,bt",
    [(300, 16, 128), (1024, 8, 256), (37, 8, 64),
     # C not a multiple of the 128-lane tile: the wrapper zero-pads channels
     # (the real BigVGAN stages hit C=192/96)
     (256, 192, 128), (300, 96, 256)],
)
def test_pallas_snake_matches_xla(rng, T, C, bt):
    x = rng.standard_normal((2, T, C)).astype(np.float32)
    a = (rng.standard_normal(C) * 0.3).astype(np.float32)
    b = (rng.standard_normal(C) * 0.3).astype(np.float32)
    want = np.asarray(
        anti_alias_snake(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), True)
    )
    got = np.asarray(
        anti_alias_snake_pallas(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), True,
            block_t=bt, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pallas_snake_linear_scale(rng):
    x = rng.standard_normal((1, 200, 8)).astype(np.float32)
    a = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
    b = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
    want = np.asarray(
        anti_alias_snake(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), False)
    )
    got = np.asarray(
        anti_alias_snake_pallas(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), False,
            block_t=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize(
    "T,C,bt",
    # the real narrow-channel BigVGAN stages (24/48/96ch) plus edge shapes:
    # T not a block multiple, tiny T, C not a sublane-tile multiple
    [(2048, 24, 512), (700, 48, 256), (300, 96, 128), (37, 12, 128),
     (1024, 192, 256)],
)
def test_pallas_snake_t_matches_xla(rng, T, C, bt):
    from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas_t

    x = rng.standard_normal((2, T, C)).astype(np.float32)
    a = (rng.standard_normal(C) * 0.3).astype(np.float32)
    b = (rng.standard_normal(C) * 0.3).astype(np.float32)
    want = np.asarray(
        anti_alias_snake(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), True)
    )
    got = np.asarray(
        anti_alias_snake_pallas_t(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), True,
            block_t=bt, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pallas_snake_t_linear_scale(rng):
    from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas_t

    x = rng.standard_normal((1, 500, 24)).astype(np.float32)
    a = np.abs(rng.standard_normal(24)).astype(np.float32) + 0.5
    b = np.abs(rng.standard_normal(24)).astype(np.float32) + 0.5
    want = np.asarray(
        anti_alias_snake(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), False)
    )
    got = np.asarray(
        anti_alias_snake_pallas_t(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), False,
            block_t=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)
