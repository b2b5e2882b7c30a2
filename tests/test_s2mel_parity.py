"""Golden parity: flax s2mel stack (DiT + CFM + length regulator + gpt_layer)
vs the reference torch implementation with random weights."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.config import (  # noqa: E402
    DiTConfig,
    LengthRegulatorConfig,
    S2MelConfig,
    WaveNetConfig,
)
from indextts_tpu.models.s2mel import S2Mel  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402
from indextts_tpu.runtime.s2mel_infer import cfm_inference, length_regulate  # noqa: E402


class AD(dict):
    """attr-dict standing in for the reference's Munch/DictConfig."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


MEL = 8
HID = 64
DEPTH = 5
STYLE = 12
CONTENT = 24
WN_HID = 64  # must equal HID: reference FinalLayer applies adaLN on t1 (dit-hidden)
WN_LAYERS = 3


def ref_args():
    return AD(
        dit_type="DiT",
        reg_loss_type="l1",
        style_encoder=AD(dim=STYLE),
        length_regulator=AD(
            channels=16,
            is_discrete=False,
            in_channels=CONTENT,
            content_codebook_size=32,
            sampling_ratios=[1, 1],
            vector_quantize=False,
            n_codebooks=1,
            quantizer_dropout=0.0,
            f0_condition=False,
            n_f0_bins=8,
        ),
        DiT=AD(
            hidden_dim=HID,
            num_heads=4,
            depth=DEPTH,
            class_dropout_prob=0.1,
            block_size=1024,
            in_channels=MEL,
            style_condition=True,
            final_layer_type="wavenet",
            target="mel",
            content_dim=CONTENT,
            content_codebook_size=16,
            content_type="discrete",
            f0_condition=False,
            n_f0_bins=8,
            content_codebooks=1,
            is_causal=False,
            long_skip_connection=True,
            zero_prompt_speech_token=False,
            time_as_token=False,
            style_as_token=False,
            uvit_skip_connection=True,
            add_resblock_in_transformer=False,
        ),
        wavenet=AD(
            hidden_dim=WN_HID,
            num_layers=WN_LAYERS,
            kernel_size=5,
            dilation_rate=1,
            p_dropout=0.0,
            style_condition=True,
        ),
    )


def my_cfg() -> S2MelConfig:
    return S2MelConfig(
        length_regulator=LengthRegulatorConfig(
            channels=16, in_channels=CONTENT, sampling_ratios=(1, 1)
        ),
        dit=DiTConfig(
            hidden_dim=HID,
            num_heads=4,
            depth=DEPTH,
            in_channels=MEL,
            content_dim=CONTENT,
            style_dim=STYLE,
        ),
        wavenet=WaveNetConfig(
            hidden_dim=WN_HID, num_layers=WN_LAYERS, kernel_size=5, p_dropout=0.0
        ),
        gpt_dims=(20, 10, 6, CONTENT),
    )


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(7)
    fm = import_reference("indextts.s2mel.modules.flow_matching")
    lr_mod = import_reference("indextts.s2mel.modules.length_regulator")
    args = ref_args()
    cfm = fm.CFM(args).eval()
    cfm.estimator.setup_caches(max_batch_size=1, max_seq_length=512)
    lr = lr_mod.InterpolateRegulator(
        channels=16,
        sampling_ratios=(1, 1),
        is_discrete=False,
        in_channels=CONTENT,
        codebook_size=32,
    ).eval()
    gpt_layer = torch.nn.Sequential(
        torch.nn.Linear(20, 10), torch.nn.Linear(10, 6), torch.nn.Linear(6, CONTENT)
    ).eval()

    cfg = my_cfg()
    model = S2Mel(cfg)
    net = {
        "cfm": tc.to_numpy_sd(cfm.state_dict()),
        "length_regulator": tc.to_numpy_sd(lr.state_dict()),
        "gpt_layer": tc.to_numpy_sd(gpt_layer.state_dict()),
    }
    params = {
        "params": tc.convert_s2mel(net, depth=DEPTH, wn_layers=WN_LAYERS, n_ratios=2)
    }
    return cfm, lr, gpt_layer, model, params


def test_dit_velocity_parity(models, rng):
    cfm, _, _, model, params = models
    B, T = 1, 50
    x = rng.standard_normal((B, MEL, T)).astype(np.float32)
    prompt = np.zeros((B, MEL, T), np.float32)
    prompt[:, :, :17] = rng.standard_normal((B, MEL, 17))
    style = rng.standard_normal((B, STYLE)).astype(np.float32)
    cond = rng.standard_normal((B, T, CONTENT)).astype(np.float32)
    t = np.array([0.35], np.float32)
    lens = np.array([T])

    with torch.no_grad():
        want = cfm.estimator(
            torch.from_numpy(x),
            torch.from_numpy(prompt),
            torch.from_numpy(lens),
            torch.from_numpy(t),
            torch.from_numpy(style),
            torch.from_numpy(cond),
        ).numpy()

    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(prompt),
            jnp.asarray(lens),
            jnp.asarray(t),
            jnp.asarray(style),
            jnp.asarray(cond),
            method=S2Mel.velocity,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_cfm_solver_parity(models, rng):
    cfm, _, _, model, params = models
    B, T, P, steps = 1, 61, 23, 4
    noise = rng.standard_normal((B, MEL, T)).astype(np.float32)
    prompt = rng.standard_normal((B, MEL, P)).astype(np.float32)
    style = rng.standard_normal((B, STYLE)).astype(np.float32)
    mu = rng.standard_normal((B, T, CONTENT)).astype(np.float32)
    lens = np.array([T])
    cfg_rate = 0.7

    with torch.no_grad():
        t_span = torch.linspace(0, 1, steps + 1)
        want = cfm.solve_euler(
            torch.from_numpy(noise.copy()),
            torch.from_numpy(lens),
            torch.from_numpy(prompt),
            torch.from_numpy(mu),
            torch.from_numpy(style),
            None,
            t_span,
            inference_cfg_rate=cfg_rate,
        ).numpy()

    prompt_x = np.zeros((B, MEL, T), np.float32)
    prompt_x[:, :, :P] = prompt
    got = np.asarray(
        cfm_inference(
            model,
            params,
            jnp.asarray(mu),
            jnp.asarray(lens),
            jnp.asarray(prompt_x),
            jnp.asarray(P),
            jnp.asarray(style),
            jnp.asarray(noise),
            n_steps=steps,
            cfg_rate=cfg_rate,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-2)


def test_length_regulator_parity(models, rng):
    _, lr, _, model, params = models
    B, S, target = 1, 40, 69
    x = rng.standard_normal((B, S, CONTENT)).astype(np.float32)
    ylens = np.array([target])
    with torch.no_grad():
        want = lr(torch.from_numpy(x), ylens=torch.from_numpy(ylens))[0].numpy()
    got = np.asarray(
        length_regulate(model, params, jnp.asarray(x), jnp.asarray(ylens), target)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_gpt_layer_parity(models, rng):
    _, _, gpt_layer, model, params = models
    x = rng.standard_normal((1, 9, 20)).astype(np.float32)
    with torch.no_grad():
        want = gpt_layer(torch.from_numpy(x)).numpy()
    from indextts_tpu.runtime.s2mel_infer import project_gpt_latent

    got = np.asarray(project_gpt_latent(model, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_cfm_bf16_estimator_close(models, rng):
    """dtype=bfloat16 CFM (bf16 params + bf16 estimator activations, fp32
    Euler state/norm islands) stays close to the fp32 solve — the fidelity
    bound behind config.runtime.s2mel_dtype."""
    _, _, _, model, params = models
    B, T, P, steps = 1, 61, 23, 4
    noise = rng.standard_normal((B, MEL, T)).astype(np.float32)
    prompt_x = np.zeros((B, MEL, T), np.float32)
    prompt_x[:, :, :P] = rng.standard_normal((B, MEL, P)).astype(np.float32)
    style = rng.standard_normal((B, STYLE)).astype(np.float32)
    mu = rng.standard_normal((B, T, CONTENT)).astype(np.float32)
    args = (
        jnp.asarray(mu), jnp.asarray(np.array([T])), jnp.asarray(prompt_x),
        jnp.asarray(P), jnp.asarray(style), jnp.asarray(noise),
    )
    want = np.asarray(
        cfm_inference(model, params, *args, n_steps=steps, cfg_rate=0.7)
    )
    p_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    got = np.asarray(
        cfm_inference(model, p_bf16, *args, n_steps=steps, cfg_rate=0.7,
                      dtype=jnp.bfloat16)
    )
    assert got.dtype == np.float32
    # valid (non-prompt) frames: relative L2 within bf16 round-off growth
    rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
    assert rel < 0.08, rel
