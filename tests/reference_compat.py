"""Import helper for golden-parity tests against the reference implementation.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT; we execute its
model definitions in-process ONLY inside tests, with random weights, to verify
numerical parity of our from-scratch flax implementations. Several of its
third-party deps are absent in this image (munch, librosa, torchaudio,
sentencepiece, deepspeed, ...) and its vendored HF stack targets an older
transformers; this module installs the minimal stubs/patches needed to import
the *model* modules (never the serving/IO paths).
"""

from __future__ import annotations

import re
import sys
import types


REFERENCE_ROOT = "/root/reference"


class _Anything:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Anything()


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    # a real-looking __spec__ so importlib.util.find_spec() doesn't choke
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_stubs():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # munch.Munch used only as a type/attr-dict
    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub_module("munch", Munch=Munch)

    # librosa: only filters.mel is used by module-level imports
    from indextts_tpu.ops.mel import mel_filterbank

    def _librosa_mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    lib = _stub_module("librosa")
    lib.filters = _stub_module("librosa.filters", mel=_librosa_mel)
    lib.load = None

    _stub_module("torchaudio", transforms=_Anything(), compliance=_Anything())
    _stub_module("sentencepiece", SentencePieceProcessor=_Anything)
    _stub_module("modelscope", AutoModelForCausalLM=_Anything)
    _stub_module("omegaconf", OmegaConf=_Anything)

    # transformers>=4.5x dropped some names the vendored stack imports
    import transformers.cache_utils as _cu

    for _n in ("QuantizedCacheConfig",):
        if not hasattr(_cu, _n):
            setattr(_cu, _n, type(_n, (), {}))

    # attributes dropped from GenerationConfig that the vendored
    # generation stack still reads
    from transformers.generation.configuration_utils import GenerationConfig

    for _n in ("forced_decoder_ids", "exponential_decay_length_penalty",
               "suppress_tokens", "begin_suppress_tokens"):
        if not hasattr(GenerationConfig, _n):
            setattr(GenerationConfig, _n, None)

    try:
        import tqdm  # noqa: F401
    except ImportError:
        _stub_module("tqdm", tqdm=lambda x, **k: x)

    try:
        import wetext  # noqa: F401
    except ImportError:
        _stub_module("wetext", Normalizer=_Anything)

    # the reference's dead-weight dac package needs audiotools; the live
    # inference path only touches dac.nn.quantize.VectorQuantize (unused when
    # vector_quantize=False), so stub the leaf module to skip dac/__init__
    _stub_module("indextts.s2mel.dac.nn.quantize", VectorQuantize=_Anything)


def import_reference(module_name: str, max_patches: int = 60):
    """Import a reference module, auto-stubbing missing third-party names.

    Retries on `ImportError: cannot import name 'X' from 'Y'` by injecting a
    dummy attribute X into module Y (only for non-reference modules)."""
    install_stubs()
    import importlib

    for _ in range(max_patches):
        try:
            return importlib.import_module(module_name)
        except ImportError as e:
            m = re.match(r"cannot import name '(\w+)' from '([\w\.]+)'", str(e))
            if not m:
                m2 = re.match(r"No module named '([\w\.]+)'", str(e))
                if m2 and not m2.group(1).startswith("indextts"):
                    _stub_module(m2.group(1))
                    continue
                raise
            name, src = m.group(1), m.group(2)
            if src.startswith("indextts"):
                raise
            mod = importlib.import_module(src)
            if not hasattr(mod, name):
                setattr(mod, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
            else:
                raise
    raise RuntimeError(f"too many patches importing {module_name}")
