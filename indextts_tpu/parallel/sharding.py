"""Mesh construction and parameter partition specs.

Design (SURVEY §2.7 TPU plan): one 2-D mesh (data, model).
  * data  — utterance batches, DP across hosts; gradients psum over DCN.
  * model — tensor parallelism over ICI: GPT-2 attention/MLP column+row
    sharding (c_attn/c_fc outputs sharded, c_proj inputs sharded; XLA inserts
    the psum at block boundaries), embeddings sharded on the vocab axis.

Everything degrades gracefully to mesh=(1,1) single chip.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


# Partition rules for the UnifiedVoice param tree: (regex on the flattened
# path, PartitionSpec). First match wins; default is replicated.
GPT_PARTITION_RULES = [
    # W8A8 int8 layout (models/gpt2.py Conv1D quantize): kernel_q shards
    # like kernel; the per-OUT-channel kernel_scale shards with the output
    # axis (column-sharded layers) or replicates (row-sharded projections,
    # whose outputs are psum-reduced full-width). Listed before the float
    # rules because first-match-wins and re.search("kernel") also hits
    # "kernel_scale" with an out-of-rank spec.
    # W4 packed-nibble layout (Conv1D wbits=4, kernel_q4) — listed before
    # the kernel_q rules because re.search("kernel_q") also matches
    # "kernel_q4" and the packed axes shard differently:
    #   * c_attn/c_fc pack CONTRACTION rows (pairs i, i+d/2 along axis 0);
    #     axis 0 stays replicated, the un-packed output axis column-shards.
    #   * attn c_proj also packs its contraction rows — but those rows are
    #     the head-sharded activation dim, and the packed pairs (i, i+d/2)
    #     interleave shards, so row-sharding would misalign with the
    #     activations and force regather collectives: replicate instead.
    #   * mlp c_proj (w4_cols=True) packs OUTPUT cols; its un-packed
    #     contraction axis row-shards like the float kernel.
    (r"gpt/h_\d+/attn/c_attn/kernel_q4$", P(None, "model")),
    (r"gpt/h_\d+/attn/c_proj/kernel_q4$", P()),
    (r"gpt/h_\d+/mlp/c_fc/kernel_q4$", P(None, "model")),
    (r"gpt/h_\d+/mlp/c_proj/kernel_q4$", P("model", None)),
    (r"gpt/h_\d+/attn/c_attn/kernel_q$", P(None, "model")),
    (r"gpt/h_\d+/attn/c_attn/kernel_scale", P("model")),
    (r"gpt/h_\d+/attn/c_proj/kernel_q$", P("model", None)),
    (r"gpt/h_\d+/attn/c_proj/kernel_scale", P()),
    (r"gpt/h_\d+/mlp/c_fc/kernel_q$", P(None, "model")),
    (r"gpt/h_\d+/mlp/c_fc/kernel_scale", P("model")),
    (r"gpt/h_\d+/mlp/c_proj/kernel_q$", P("model", None)),
    (r"gpt/h_\d+/mlp/c_proj/kernel_scale", P()),
    # GPT-2 blocks: column-shard fused qkv + mlp up, row-shard projections
    (r"gpt/h_\d+/attn/c_attn/kernel", P(None, "model")),
    (r"gpt/h_\d+/attn/c_attn/bias", P("model")),
    (r"gpt/h_\d+/attn/c_proj/kernel", P("model", None)),
    (r"gpt/h_\d+/mlp/c_fc/kernel", P(None, "model")),
    (r"gpt/h_\d+/mlp/c_fc/bias", P("model")),
    (r"gpt/h_\d+/mlp/c_proj/kernel", P("model", None)),
    # big embeddings / heads: shard the vocab axis
    (r"text_embedding/embedding", P("model", None)),
    (r"mel_embedding/embedding", P("model", None)),
    # int8 head layout (gpt2.QuantDenseHead, head_quant=True): column-sharded
    # like the float kernel; per-out-column scale follows the vocab axis
    (r"mel_head/kernel_q", P(None, "model")),
    (r"mel_head/kernel_scale", P("model")),
    (r"mel_head/kernel", P(None, "model")),
    (r"mel_head/bias", P("model")),
    (r"text_head/kernel", P(None, "model")),
    (r"text_head/bias", P("model")),
    # conformer FFNs (small; shard the hidden axis anyway)
    (r"feed_forward/w_1/kernel", P(None, "model")),
    (r"feed_forward/w_2/kernel", P("model", None)),
]

DIT_PARTITION_RULES = [
    (r"transformer/layer_\d+/attention/wqkv/kernel", P(None, "model")),
    (r"transformer/layer_\d+/attention/wo/kernel", P("model", None)),
    (r"transformer/layer_\d+/feed_forward/w1/kernel", P(None, "model")),
    (r"transformer/layer_\d+/feed_forward/w3/kernel", P(None, "model")),
    (r"transformer/layer_\d+/feed_forward/w2/kernel", P("model", None)),
]


def spec_for_path(path: str, rules) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def shard_params(params, mesh: Mesh, rules, strict: bool = False) -> Any:
    """Place a param tree on the mesh according to the rules.

    A rule whose axis does not divide evenly is replicated instead; with
    strict=True that is an error (used by the multi-chip dryrun so
    flagship-dim divisibility problems surface instead of silently
    degrading to replication)."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    dropped = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = spec_for_path(pstr, rules)
        fixed = []
        for axis_idx, name in enumerate(spec):
            if name is None:
                fixed.append(None)
                continue
            size = mesh.shape[name]
            if axis_idx < leaf.ndim and leaf.shape[axis_idx] % size == 0:
                fixed.append(name)
            else:
                fixed.append(None)
                dropped.append(
                    f"{pstr}: shape {leaf.shape} axis {axis_idx} !% "
                    f"{name}={size}"
                )
        sharding = NamedSharding(mesh, P(*fixed) if fixed else P())
        out.append(jax.device_put(leaf, sharding))
    if dropped and strict:
        raise ValueError(
            "partition rules dropped (axis not divisible by mesh):\n  "
            + "\n  ".join(dropped)
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
    )
