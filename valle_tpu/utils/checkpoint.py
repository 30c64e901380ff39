"""Checkpointing: orbax-backed save/load + PyTorch state_dict importer.

Capability parity with the reference's icefall checkpoint module usage
(``valle/bin/trainer.py:331-483``): epoch/step checkpoints with pruning,
best-train/best-valid tracking, stage-switch resume (optimizer state dropped
when the train stage changes, SURVEY.md §3.5), and model hyperparameters
persisted inside the checkpoint so inference can rebuild the model from the
checkpoint alone (``valle/bin/infer.py:126-136``).

``import_torch_state_dict`` maps the reference's parameter naming
(``ar_text_embedding.word_embeddings.weight`` etc., see
``valle/models/valle.py:85-279``) onto our pytree so reference-trained
checkpoints run on TPU and fp32 parity can be tested.
"""

from __future__ import annotations

import json
import logging
import shutil
from dataclasses import asdict
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PyTorch state_dict import
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def import_torch_state_dict(sd: Dict[str, Any], cfg) -> tuple:
    """Convert a reference VALL-E/VALL-F state_dict into (params, state).

    ``sd`` maps reference parameter names to torch tensors or numpy arrays.
    Weight layout notes: torch Linear stores (out, in) and we store
    (in, out); torch MHA packs q/k/v into ``in_proj_weight`` (3d, d) which
    maps to our ``in_w`` (d, 3d) transposed.
    """
    from ..models.valle import ValleConfig  # local import to avoid cycle

    assert isinstance(cfg, ValleConfig)
    Q = cfg.num_quantizers
    d, nd = cfg.d_model, cfg.nar_d_model
    get = lambda k: _np(sd[k]).astype(np.float32)

    def linear_w(k):
        return get(k).T  # (out,in) -> (in,out)

    def stack_layers(prefix, n, mapper):
        per = [mapper(f"{prefix}.{i}") for i in range(n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)

    is_vallf = cfg.model_name == "vallf"

    def map_layer(p):
        lp = {
            "self_attn": {
                "in_w": get(f"{p}.self_attn.in_proj_weight").T,
                "in_b": get(f"{p}.self_attn.in_proj_bias"),
                "out_w": linear_w(f"{p}.self_attn.out_proj.weight"),
                "out_b": get(f"{p}.self_attn.out_proj.bias"),
            },
            "ffn": {
                "lin1": {"w": linear_w(f"{p}.linear1.weight"),
                         "b": get(f"{p}.linear1.bias")},
                "lin2": {"w": linear_w(f"{p}.linear2.weight"),
                         "b": get(f"{p}.linear2.bias")},
            },
        }
        if is_vallf:
            lp["cross_attn"] = {
                "in_w": get(f"{p}.multihead_attn.in_proj_weight").T,
                "in_b": get(f"{p}.multihead_attn.in_proj_bias"),
                "out_w": linear_w(f"{p}.multihead_attn.out_proj.weight"),
                "out_b": get(f"{p}.multihead_attn.out_proj.bias"),
            }
        norm_names = ["norm1", "norm2"] + (["norm3"] if is_vallf else [])
        for nm in norm_names:
            if f"{p}.{nm}.project_layer.weight" in sd:  # AdaLN
                lp[nm] = {
                    "proj": {"w": linear_w(f"{p}.{nm}.project_layer.weight"),
                             "b": get(f"{p}.{nm}.project_layer.bias")},
                    "norm": {"scale": get(f"{p}.{nm}.norm.weight"),
                             "bias": get(f"{p}.{nm}.norm.bias")},
                }
            else:
                lp[nm] = {"scale": get(f"{p}.{nm}.weight"),
                          "bias": get(f"{p}.{nm}.bias")}
        return lp

    params: Dict[str, Any] = {"ar": {}, "nar": {}}
    state: Dict[str, Any] = {"ar": {}, "nar": {}}

    ar = params["ar"]
    ar["text_emb"] = {"weight": get("ar_text_embedding.word_embeddings.weight")}
    ar["audio_emb"] = {
        "weight": get("ar_audio_embedding.word_embeddings.weight")}
    ar["text_pe"] = {"alpha": get("ar_text_position.alpha").reshape(1)}
    ar["audio_pe"] = {"alpha": get("ar_audio_position.alpha").reshape(1)}
    ar["decoder"] = {
        "layers": stack_layers("ar_decoder.layers", cfg.num_layers, map_layer)
    }
    if "ar_decoder.norm.weight" in sd:
        ar["decoder"]["final_norm"] = {
            "scale": get("ar_decoder.norm.weight"),
            "bias": get("ar_decoder.norm.bias")}
    ar["predict"] = {"w": linear_w("ar_predict_layer.weight")}

    if Q > 1:
        nar = params["nar"]
        nar["text_emb"] = {
            "weight": get("nar_text_embedding.word_embeddings.weight")}
        embs = []
        for j in range(Q):
            w = get(f"nar_audio_embeddings.{j}.word_embeddings.weight")
            if w.shape[0] == cfg.num_audio_tokens:  # pad row for stacking
                w = np.concatenate(
                    [w, np.zeros((1, w.shape[1]), np.float32)], axis=0)
            embs.append(w)
        nar["audio_embs"] = {"weight": jnp.stack(embs)}
        nar["text_pe"] = {}
        nar["audio_pe"] = {}
        nar["decoder"] = {
            "layers": stack_layers(
                "nar_decoder.layers", cfg.nar_num_layers, map_layer)
        }
        if "nar_decoder.norm.project_layer.weight" in sd:
            nar["decoder"]["final_norm"] = {
                "proj": {"w": linear_w("nar_decoder.norm.project_layer.weight"),
                         "b": get("nar_decoder.norm.project_layer.bias")},
                "norm": {"scale": get("nar_decoder.norm.norm.weight"),
                         "bias": get("nar_decoder.norm.norm.bias")},
            }
        if cfg.share_embedding:
            nar["predict_last"] = {
                "w": linear_w(f"nar_predict_layers.{Q - 2}.weight")}
        else:
            nar["predict"] = {"w": jnp.stack(
                [linear_w(f"nar_predict_layers.{j}.weight")
                 for j in range(Q - 1)])}
        nar["stage_embs"] = {"weight": jnp.concatenate(
            [get(f"nar_stage_embeddings.{j}.word_embeddings.weight")
             for j in range(Q - 1)], axis=0)}

    # prenets (BatchNorm running stats go to `state`)
    if cfg.add_prenet:
        for branch, dm in (("ar", d), ("nar", nd)):
            tp, tps = {}, {}
            # reference Sequential indices: convs at 1,5,9; bns at 2,6,10;
            # final linear at 14 (valle.py:97-113)
            for i, (ci, bi) in enumerate(((1, 2), (5, 6), (9, 10))):
                pfx = f"{branch}_text_prenet.{ci}"
                tp[f"conv{i}"] = {
                    # torch conv1d weight (out, in, k) -> ours (k, in, out)
                    "w": np.transpose(get(f"{pfx}.weight"), (2, 1, 0)),
                    "b": get(f"{pfx}.bias"),
                }
                bpfx = f"{branch}_text_prenet.{bi}"
                tp[f"bn{i}"] = {"scale": get(f"{bpfx}.weight"),
                                "bias": get(f"{bpfx}.bias")}
                tps[f"bn{i}"] = {"mean": get(f"{bpfx}.running_mean"),
                                 "var": get(f"{bpfx}.running_var")}
            tp["out"] = {"w": linear_w(f"{branch}_text_prenet.14.weight"),
                         "b": get(f"{branch}_text_prenet.14.bias")}
            params[branch]["text_prenet"] = tp
            state[branch]["text_prenet"] = tps
            ap = {}
            for i, li in enumerate((0, 3, 6)):
                ap[f"lin{i}"] = {
                    "w": linear_w(f"{branch}_audio_prenet.{li}.weight"),
                    "b": get(f"{branch}_audio_prenet.{li}.bias")}
            params[branch]["audio_prenet"] = ap

    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    return params, state


def export_torch_state_dict(params, cfg, state=None) -> Dict[str, np.ndarray]:
    """Inverse of ``import_torch_state_dict``: our pytree -> a reference-
    named state_dict (numpy arrays, torch layouts).

    Enables interop in BOTH directions: models trained on TPU can be
    loaded by the reference's ``bin/infer.py`` / eval tooling
    (``/root/reference/valle/bin/infer.py:126-148`` rebuilds the model
    from checkpoint hyperparameters and ``load_state_dict``). The key set
    matches ``Model.state_dict()`` exactly — including the tied
    ``nar_predict_layers.{j}.weight`` copies that torch emits for shared
    embeddings (``/root/reference/valle/models/valle.py:261-271``) and
    BatchNorm's ``num_batches_tracked`` counters — so ``strict=True``
    loads succeed (round-tripped in ``tests/test_torch_export.py``).
    """
    from ..models.valle import ValleConfig  # local import to avoid cycle

    assert isinstance(cfg, ValleConfig)
    Q = cfg.num_quantizers
    V = cfg.num_audio_tokens
    is_vallf = cfg.model_name == "vallf"
    sd: Dict[str, np.ndarray] = {}

    def put(k, v):
        sd[k] = np.asarray(v, dtype=np.float32)

    def put_linear(k, w):  # ours (in, out) -> torch (out, in)
        put(k, np.asarray(w, np.float32).T)

    def put_norm(prefix, n):
        if "proj" in n:  # AdaptiveLayerNorm
            put_linear(f"{prefix}.project_layer.weight", n["proj"]["w"])
            put(f"{prefix}.project_layer.bias", n["proj"]["b"])
            put(f"{prefix}.norm.weight", n["norm"]["scale"])
            put(f"{prefix}.norm.bias", n["norm"]["bias"])
        else:
            put(f"{prefix}.weight", n["scale"])
            put(f"{prefix}.bias", n["bias"])

    def put_layers(prefix, layers):
        n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
        for i in range(n_layers):
            lp = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], layers)
            p = f"{prefix}.{i}"
            put(f"{p}.self_attn.in_proj_weight",
                np.asarray(lp["self_attn"]["in_w"], np.float32).T)
            put(f"{p}.self_attn.in_proj_bias", lp["self_attn"]["in_b"])
            put_linear(f"{p}.self_attn.out_proj.weight",
                       lp["self_attn"]["out_w"])
            put(f"{p}.self_attn.out_proj.bias", lp["self_attn"]["out_b"])
            if is_vallf:
                put(f"{p}.multihead_attn.in_proj_weight",
                    np.asarray(lp["cross_attn"]["in_w"], np.float32).T)
                put(f"{p}.multihead_attn.in_proj_bias",
                    lp["cross_attn"]["in_b"])
                put_linear(f"{p}.multihead_attn.out_proj.weight",
                           lp["cross_attn"]["out_w"])
                put(f"{p}.multihead_attn.out_proj.bias",
                    lp["cross_attn"]["out_b"])
            put_linear(f"{p}.linear1.weight", lp["ffn"]["lin1"]["w"])
            put(f"{p}.linear1.bias", lp["ffn"]["lin1"]["b"])
            put_linear(f"{p}.linear2.weight", lp["ffn"]["lin2"]["w"])
            put(f"{p}.linear2.bias", lp["ffn"]["lin2"]["b"])
            for nm in ["norm1", "norm2"] + (["norm3"] if is_vallf else []):
                put_norm(f"{p}.{nm}", lp[nm])

    def put_prenets(branch):
        bp = params[branch].get("text_prenet")
        if bp is None:
            return
        bs = (state or {}).get(branch, {}).get("text_prenet", {})
        for i, (ci, bi) in enumerate(((1, 2), (5, 6), (9, 10))):
            put(f"{branch}_text_prenet.{ci}.weight",
                np.transpose(np.asarray(bp[f"conv{i}"]["w"], np.float32),
                             (2, 1, 0)))
            put(f"{branch}_text_prenet.{ci}.bias", bp[f"conv{i}"]["b"])
            put(f"{branch}_text_prenet.{bi}.weight", bp[f"bn{i}"]["scale"])
            put(f"{branch}_text_prenet.{bi}.bias", bp[f"bn{i}"]["bias"])
            bn_state = bs.get(f"bn{i}", {})
            put(f"{branch}_text_prenet.{bi}.running_mean",
                bn_state.get("mean", np.zeros_like(
                    np.asarray(bp[f"bn{i}"]["scale"]))))
            put(f"{branch}_text_prenet.{bi}.running_var",
                bn_state.get("var", np.ones_like(
                    np.asarray(bp[f"bn{i}"]["scale"]))))
            sd[f"{branch}_text_prenet.{bi}.num_batches_tracked"] = (
                np.asarray(0, dtype=np.int64))
        put_linear(f"{branch}_text_prenet.14.weight", bp["out"]["w"])
        put(f"{branch}_text_prenet.14.bias", bp["out"]["b"])
        ap = params[branch]["audio_prenet"]
        for i, li in enumerate((0, 3, 6)):
            put_linear(f"{branch}_audio_prenet.{li}.weight", ap[f"lin{i}"]["w"])
            put(f"{branch}_audio_prenet.{li}.bias", ap[f"lin{i}"]["b"])

    ar = params["ar"]
    put("ar_text_embedding.word_embeddings.weight", ar["text_emb"]["weight"])
    put("ar_audio_embedding.word_embeddings.weight", ar["audio_emb"]["weight"])
    put("ar_text_position.alpha", np.asarray(
        ar["text_pe"]["alpha"], np.float32).reshape(1))
    put("ar_audio_position.alpha", np.asarray(
        ar["audio_pe"]["alpha"], np.float32).reshape(1))
    put_layers("ar_decoder.layers", ar["decoder"]["layers"])
    if "final_norm" in ar["decoder"]:
        put_norm("ar_decoder.norm", ar["decoder"]["final_norm"])
    put_linear("ar_predict_layer.weight", ar["predict"]["w"])
    put_prenets("ar")

    if Q > 1:
        nar = params["nar"]
        put("nar_text_embedding.word_embeddings.weight",
            nar["text_emb"]["weight"])
        embs = np.asarray(nar["audio_embs"]["weight"], np.float32)  # (Q,V+1,nd)
        # j=0 keeps its EOS row (V+1 tokens); j>=1 drop the stacking pad row
        # (reference builds them with V rows, valle.py:172-177)
        put("nar_audio_embeddings.0.word_embeddings.weight", embs[0])
        for j in range(1, Q):
            put(f"nar_audio_embeddings.{j}.word_embeddings.weight",
                embs[j][:V])
        # torch Parameter exists (requires_grad=False, value 1) even though
        # the NAR positions are not learnable (embedding.py:61)
        sd["nar_text_position.alpha"] = np.ones((1,), np.float32)
        sd["nar_audio_position.alpha"] = np.ones((1,), np.float32)
        put_layers("nar_decoder.layers", nar["decoder"]["layers"])
        if "final_norm" in nar["decoder"]:
            put_norm("nar_decoder.norm", nar["decoder"]["final_norm"])
        if cfg.share_embedding:
            # predict layer j (0..Q-3) is TIED to audio embedding j+2;
            # state_dict() emits the tied tensors under both names
            for j in range(Q - 2):
                put(f"nar_predict_layers.{j}.weight", embs[j + 2][:V])
            put_linear(f"nar_predict_layers.{Q - 2}.weight",
                       nar["predict_last"]["w"])
        else:
            pw = np.asarray(nar["predict"]["w"], np.float32)  # (Q-1, nd, V)
            for j in range(Q - 1):
                put(f"nar_predict_layers.{j}.weight", pw[j].T)
        stage = np.asarray(nar["stage_embs"]["weight"], np.float32)  # (Q-1,nd)
        for j in range(Q - 1):
            put(f"nar_stage_embeddings.{j}.word_embeddings.weight",
                stage[j][None, :])
        put_prenets("nar")

    return sd


def load_torch_checkpoint(path: str, cfg=None):
    """Load a reference ``.pt`` checkpoint file (needs torch, CPU-only).

    Returns (params, state, ckpt_dict). If ``cfg`` is None it is rebuilt
    from the hyperparameters stored in the checkpoint (reference
    ``bin/infer.py:126-136`` behavior).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if cfg is None:
        from ..models.valle import ValleConfig

        name = str(ckpt.get("model_name", "VALL-E")).lower()
        cfg = ValleConfig(
            model_name="vallf" if name in ("vall-f", "vallf") else "valle",
            d_model=ckpt.get("decoder_dim", 1024),
            nhead=ckpt.get("nhead", 16),
            num_layers=ckpt.get("num_decoder_layers", 12),
            norm_first=ckpt.get("norm_first", True),
            add_prenet=ckpt.get("add_prenet", False),
            prefix_mode=ckpt.get("prefix_mode", 0),
            share_embedding=ckpt.get("share_embedding", True),
            nar_scale_factor=ckpt.get("scale_factor", 1.0),
            prepend_bos=ckpt.get("prepend_bos", False),
            num_quantizers=ckpt.get("num_quantizers", 8),
        )
    params, state = import_torch_state_dict(sd, cfg)
    return params, state, ckpt


# ---------------------------------------------------------------------------
# Orbax save/load
# ---------------------------------------------------------------------------


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    out_dir: str,
    name: str,
    *,
    params,
    state=None,
    opt_state=None,
    model_avg=None,
    sampler_state: Optional[dict] = None,
    run_params: Optional[dict] = None,
) -> str:
    """Write one checkpoint directory ``{out_dir}/{name}``.

    Layout mirrors the reference checkpoint contents (model, optimizer,
    sampler state, params/config — ``bin/trainer.py:436-483``) as orbax
    items plus a JSON sidecar for host-side metadata.

    Multi-process: EVERY process must call this (orbax synchronizes
    internally and each process writes only the array shards it owns —
    required for tp>1 where no single host holds the full tree; the
    reference's rank-0-only torch.save gating deadlocks here). Host-side
    fs mutations (clearing a stale dir, the JSON sidecar) are done by
    process 0 alone, with a device barrier between the clear and the
    save. Exercised by tests/test_multiprocess.py.
    """
    ocp = _ocp()
    path = Path(out_dir).absolute() / name
    primary = jax.process_index() == 0
    if primary and path.exists():
        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt-clear-{name}")
    items = {"params": params}
    if state:
        items["state"] = state
    if opt_state is not None:
        items["opt_state"] = opt_state
    if model_avg is not None:
        items["model_avg"] = model_avg
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "tree", items)
    if primary:
        meta = {"sampler_state": sampler_state, "run_params": run_params}
        (path / "meta.json").write_text(json.dumps(meta, default=str))
    return str(path)


def load_checkpoint(path: str, template=None):
    """Load a checkpoint directory; returns (items, meta)."""
    ocp = _ocp()
    p = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            items = ckptr.restore(p / "tree", item=template)
        else:
            # restore to host numpy: a checkpoint written by an
            # N-process sharded job must load in ANY topology (resume on
            # fewer hosts, export, infer) — shards were materialized to
            # disk, so ask orbax for plain arrays instead of making it
            # guess a device sharding for the saved jax.Arrays
            meta = ckptr.metadata(p / "tree").item_metadata.tree
            rargs = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            items = ckptr.restore(p / "tree", restore_args=rargs)
    meta = {}
    mp = p / "meta.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return items, meta


def _canon_path(path) -> tuple:
    out = []
    for e in path:
        k = getattr(e, "key", None)
        if k is None:
            k = getattr(e, "name", None)
        if k is None:
            k = getattr(e, "idx", None)
        out.append(str(k))
    return tuple(out)


def restore_tree(template, raw):
    """Rebuild a ``template``-structured pytree from an orbax-restored raw
    tree (which comes back as plain dicts/lists, losing namedtuple types
    such as optax optimizer states). Leaves are matched by key path —
    namedtuple fields vs dict keys vs sequence indices all canonicalize to
    the same strings — so leaf ORDER differences between the saved dict
    (sorted keys) and the template (field order) cannot mis-assign leaves.
    """
    flat_raw = jax.tree_util.tree_flatten_with_path(raw)[0]
    raw_map = {_canon_path(p): leaf for p, leaf in flat_raw}

    def pick(path, t_leaf):
        leaf = raw_map[_canon_path(path)]
        return jnp.asarray(leaf)

    return jax.tree_util.tree_map_with_path(pick, template)


def remove_checkpoints(out_dir: str, keep_last_k: int) -> None:
    """Prune step checkpoints, keeping the newest k (trainer.py:716-738)."""
    if keep_last_k <= 0:
        return
    root = Path(out_dir)
    steps = sorted(
        (int(p.name.split("-")[1]) for p in root.glob("checkpoint-*")
         if p.name.split("-")[1].isdigit()),
    )
    for s in steps[:-keep_last_k]:
        shutil.rmtree(root / f"checkpoint-{s}", ignore_errors=True)
