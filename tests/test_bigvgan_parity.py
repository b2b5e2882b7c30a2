"""Golden parity: flax BigVGAN + anti-aliased SnakeBeta vs reference torch
(random weights, tiny config). The snake path is the waveform-parity gate
(SURVEY.md §7.3)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.config import BigVGANConfig  # noqa: E402
from indextts_tpu.models.bigvgan import BigVGAN  # noqa: E402
from indextts_tpu.ops import snake as snake_ops  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402


class AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


TINY = BigVGANConfig(
    num_mels=8,
    upsample_rates=(4, 2, 2),
    upsample_kernel_sizes=(8, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(3)
    bv = import_reference("indextts.s2mel.modules.bigvgan.bigvgan")
    h = AttrDict(
        num_mels=TINY.num_mels,
        upsample_rates=list(TINY.upsample_rates),
        upsample_kernel_sizes=list(TINY.upsample_kernel_sizes),
        upsample_initial_channel=TINY.upsample_initial_channel,
        resblock_kernel_sizes=list(TINY.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in TINY.resblock_dilation_sizes],
        resblock="1",
        activation="snakebeta",
        snake_logscale=True,
        use_bias_at_final=False,
        use_tanh_at_final=False,
    )
    ref = bv.BigVGAN(h, use_cuda_kernel=False)
    ref.remove_weight_norm()
    ref.eval()
    model = BigVGAN(TINY)
    params = {"params": tc.convert_bigvgan(tc.to_numpy_sd(ref.state_dict()), TINY)}
    return ref, model, params


def test_alias_free_activation_parity(rng):
    """up2 -> snakebeta -> down2 vs reference torch Activation1d."""
    act_mod = import_reference(
        "indextts.s2mel.modules.bigvgan.alias_free_activation.torch.act"
    )
    activations = import_reference("indextts.s2mel.modules.bigvgan.activations")
    torch.manual_seed(1)
    C, T = 6, 64
    snake = activations.SnakeBeta(C, alpha_logscale=True)
    with torch.no_grad():
        snake.alpha.copy_(torch.randn(C) * 0.3)
        snake.beta.copy_(torch.randn(C) * 0.3)
    act = act_mod.Activation1d(activation=snake).eval()
    x = rng.standard_normal((2, C, T)).astype(np.float32)
    with torch.no_grad():
        want = act(torch.from_numpy(x)).numpy()
    got = np.asarray(
        snake_ops.anti_alias_snake(
            jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(snake.alpha.detach().numpy()),
            jnp.asarray(snake.beta.detach().numpy()),
            True,
        )
    ).transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bigvgan_forward_parity(models, rng):
    ref, model, params = models
    mel = rng.standard_normal((1, TINY.num_mels, 23)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()  # (B, 1, T*up)
    got = np.asarray(model.apply(params, jnp.asarray(mel)))
    assert got.shape == (1, want.shape[-1])
    np.testing.assert_allclose(got, want[:, 0], atol=5e-5, rtol=1e-3)


def test_bigvgan_bf16_close(models, rng):
    """bf16-compute vocoder (TARS_VOC_DTYPE=bfloat16: bf16 params +
    activations, the r3 fast-serving mode) tracks the fp32 forward: high
    waveform correlation, bounded relative error. fp32 stays the parity
    default; this bounds the opt-in's fidelity cost."""
    _, model, params = models
    mel = rng.standard_normal((2, TINY.num_mels, 32)).astype(np.float32)
    want = np.asarray(model.apply(params, jnp.asarray(mel)))
    m16 = BigVGAN(TINY, dtype=jnp.bfloat16)
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32
        else x,
        params,
    )
    got = np.asarray(m16.apply(p16, jnp.asarray(mel))).astype(np.float32)
    assert got.shape == want.shape
    num = np.linalg.norm(got - want)
    den = np.linalg.norm(want) + 1e-9
    assert num / den < 0.05, num / den
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.995, c


def test_snake_impl_dispatch_equivalence(rng):
    """All three anti-alias-snake implementations (sliced / conv / auto)
    agree to float tolerance; "auto" picks sliced at B=1 and conv at B>1
    (r3 v5e sweep)."""
    import os

    x = jnp.asarray(rng.standard_normal((2, 40, 6)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    outs = {}
    for impl in ("sliced", "conv", "auto"):
        os.environ["INDEXTTS_SNAKE_IMPL"] = impl
        try:
            outs[impl] = np.asarray(snake_ops.anti_alias_snake(x, a, b, True))
        finally:
            os.environ.pop("INDEXTTS_SNAKE_IMPL", None)
    np.testing.assert_allclose(outs["sliced"], outs["conv"], atol=2e-6)
    np.testing.assert_allclose(outs["auto"], outs["conv"], atol=2e-6)
