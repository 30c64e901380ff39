"""VALL-E / VALL-F neural codec language models (TPU-native).

Capability parity with reference ``valle/models/valle.py`` (VALLF at :49,
VALLE at :722): AR quantizer-0 prediction with EOS/BOS handling, NAR
quantizers 1..7 with stage-conditioned AdaLN, acoustic-prompt prefix modes
0/1/2/4, optional prenets, embedding/prediction weight tying, top-10
accuracy metrics, AR+NAR two-stage training, inference and ``continual``.

TPU-first re-design (not a port):
- pure functions over an explicit parameter pytree with ``ar``/``nar``
  top-level subtrees (this replaces the reference's ``stage_parameters``
  name-prefix filtering, reference valle.py:294-320);
- layers run via ``lax.scan``; all shapes static; prompt prefix modes are
  realized with masks + PE offsets instead of dynamic concatenation;
- AR inference is a jitted ``lax.while_loop`` over a static KV cache with
  on-device sampling and per-sample early-exit masks — the reference
  recomputes the full sequence every token (valle.py:1004-1057) and only
  supports batch size 1 (valle.py:989); here batched decode is native;
- the NAR stage index is a traced scalar: one compiled program serves all
  seven stages (embedding sums and output heads are selected by masking /
  gather instead of Python indexing).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..modules import embedding as emb
from ..modules import prenet as pre
from ..modules import transformer as tfm
from ..ops import masks as M
from ..ops.sampling import topk_sampling
from .macros import NUM_AUDIO_TOKENS, NUM_TEXT_TOKENS


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ValleConfig:
    model_name: str = "valle"            # "valle" (GPT-style) | "vallf" (enc-dec)
    d_model: int = 1024
    nhead: int = 16
    num_layers: int = 12
    norm_first: bool = True
    add_prenet: bool = False
    prefix_mode: int = 0                  # 0 | 1 | 2 | 4
    share_embedding: bool = True
    nar_scale_factor: float = 1.0
    prepend_bos: bool = False
    num_quantizers: int = 8
    num_text_tokens: int = NUM_TEXT_TOKENS
    num_audio_tokens: int = NUM_AUDIO_TOKENS
    dropout: float = 0.1
    activation: str = "relu"
    max_len: int = 4096                   # PE table length
    max_prefix_len: int = 225             # 3 s at 75 Hz (reference valle.py:350)
    # training rematerialization policy for the layer scan: "full"
    # (checkpoint everything — lowest memory, recompute-heavy), "dots"
    # (jax.checkpoint_policies.checkpoint_dots: matmul outputs saved,
    # element-wise ops recomputed), "none" (save all residuals), "scores"
    # (save all residuals EXCEPT the S x S attention score/prob matrices —
    # flash-attention's activation footprint; for shapes where "none"
    # OOMs). Measured A/Bs in BASELINE.md (bench_train_stage.py).
    remat: str = "full"
    # bf16 score/probability materialization for the attention einsum
    # path (engages whenever inputs are bf16 — training AND deterministic
    # full-sequence passes such as validation forwards and the NAR
    # inference passes, which reuse this flag via nar_score_bf16; the
    # score matmul still accumulates fp32 on the MXU; inert at fp32).
    # Halves the dominant S x S HBM traffic
    # of the NAR step: measured +21% NAR step throughput on top of
    # remat="none" (94.8 vs 114.5 ms/step, 30.3% MFU — BASELINE.md
    # round-3). Default on for the NAR stage via --attn-score-bf16 auto.
    attn_score_bf16: bool = False
    # training-attention implementation: "einsum" (XLA; scores/probs
    # materialize to HBM, attn_score_bf16 applies) or "flash" (the fused
    # fwd+bwd Pallas kernel pair, ops/flash_mha.py: masks rebuilt in VMEM
    # from int32 codes, dropout drawn in-kernel from the hardware PRNG,
    # no S x S HBM materialization in either direction). Applies to the
    # VALLE encoder-stack forwards (AR/NAR, bucketed and packed); the
    # VALLF decoder stack always uses the einsum path. Flash changes the
    # dropout mask DRAW (not the estimator), so losses move within the
    # seed-to-seed band; deterministic/fp32 forwards stay parity-exact
    # (tests/test_flash_mha.py). Resolver: models.resolve_attn_impl.
    attn_impl: str = "einsum"

    @property
    def nar_d_model(self) -> int:
        return int(self.d_model * self.nar_scale_factor)

    @property
    def nar_nhead(self) -> int:
        return int(self.nhead * self.nar_scale_factor)

    @property
    def nar_num_layers(self) -> int:
        return int(self.num_layers * self.nar_scale_factor)

    @property
    def eos_id(self) -> int:
        return self.num_audio_tokens

    @property
    def bos_id(self) -> int:
        return self.num_audio_tokens + 1

    @property
    def ar_audio_vocab(self) -> int:
        # EOS row always; BOS row only when prepend_bos
        return self.num_audio_tokens + 1 + int(self.prepend_bos)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_valle(rng: jax.Array, cfg: ValleConfig):
    """Returns (params, state). ``state`` holds prenet BatchNorm stats."""
    keys = jax.random.split(rng, 16)
    d, nd = cfg.d_model, cfg.nar_d_model
    is_vallf = cfg.model_name == "vallf"
    init_stack = tfm.init_decoder_stack if is_vallf else tfm.init_encoder_stack

    params: Dict[str, Any] = {"ar": {}, "nar": {}}
    state: Dict[str, Any] = {"ar": {}, "nar": {}}

    ar = params["ar"]
    ar["text_emb"] = emb.init_token_embedding(keys[0], cfg.num_text_tokens, d)
    ar["audio_emb"] = emb.init_token_embedding(keys[1], cfg.ar_audio_vocab, d)
    ar["text_pe"] = emb.init_sine_positional(alpha_trainable=True)
    ar["audio_pe"] = emb.init_sine_positional(alpha_trainable=True)
    ar["decoder"] = init_stack(
        keys[2], cfg.num_layers, d, cfg.nhead, d * 4, adaptive=False,
        final_norm=cfg.norm_first)
    ar["predict"] = {"w": tfm._kaiming_uniform_linear(
        keys[3], d, cfg.num_audio_tokens + 1)}
    if cfg.add_prenet:
        tp, ts = pre.init_text_prenet(keys[4], d)
        ar["text_prenet"] = tp
        state["ar"]["text_prenet"] = ts
        ar["audio_prenet"] = pre.init_audio_prenet(keys[5], d)

    if cfg.num_quantizers > 1:
        nar = params["nar"]
        nar["text_emb"] = emb.init_token_embedding(
            keys[6], cfg.num_text_tokens, nd)
        # Stacked audio embeddings: slot 0 has a PAD row (id 1024); slots
        # 1..Q-1 only use rows 0..1023 (reference valle.py:171-178). Row 1024
        # of slots >=1 exists for stacking but is never indexed — zero it so
        # the pytree matches the torch importer's canonical form and
        # export_torch_state_dict round-trips bitwise.
        embs_w = jax.random.normal(
            keys[7], (cfg.num_quantizers, cfg.num_audio_tokens + 1, nd))
        embs_w = embs_w.at[1:, cfg.num_audio_tokens, :].set(0.0)
        nar["audio_embs"] = {"weight": embs_w}
        nar["text_pe"] = emb.init_sine_positional(alpha_trainable=False)
        nar["audio_pe"] = emb.init_sine_positional(alpha_trainable=False)
        nar["decoder"] = init_stack(
            keys[8], cfg.nar_num_layers, nd, cfg.nar_nhead, nd * 4,
            adaptive=True, final_norm=cfg.norm_first)
        # Prediction heads for quantizers 1..Q-1. With share_embedding the
        # heads j in [0, Q-3] are tied to audio embedding j+2 (reference
        # valle.py:261-271); only the last head is an independent param.
        if cfg.share_embedding:
            nar["predict_last"] = {"w": tfm._kaiming_uniform_linear(
                keys[9], nd, cfg.num_audio_tokens)}
        else:
            nar["predict"] = {"w": jax.vmap(
                lambda k: tfm._kaiming_uniform_linear(
                    k, nd, cfg.num_audio_tokens)
            )(jax.random.split(keys[9], cfg.num_quantizers - 1))}
        nar["stage_embs"] = {"weight": jax.random.normal(
            keys[10], (cfg.num_quantizers - 1, nd))}
        if cfg.add_prenet:
            tp, ts = pre.init_text_prenet(keys[11], nd)
            nar["text_prenet"] = tp
            state["nar"]["text_prenet"] = ts
            nar["audio_prenet"] = pre.init_audio_prenet(keys[12], nd)

    return params, state


def nar_predict_weights(params, cfg: ValleConfig) -> jnp.ndarray:
    """Stacked NAR output heads (Q-1, nd, V), honoring weight tying."""
    if not cfg.share_embedding:
        return params["nar"]["predict"]["w"]
    embs = params["nar"]["audio_embs"]["weight"]  # (Q, V+1, nd)
    tied = embs[2:cfg.num_quantizers, : cfg.num_audio_tokens, :]  # (Q-2, V, nd)
    tied = jnp.swapaxes(tied, 1, 2)  # (Q-2, nd, V)
    last = params["nar"]["predict_last"]["w"][None]  # (1, nd, V)
    return jnp.concatenate([tied, last], axis=0)


def stage_params_mask(params, stage: int):
    """Pytree of bools marking trainable leaves for a train stage.

    Stage 1 trains the ``ar`` subtree, stage 2 the ``nar`` subtree — the
    functional equivalent of reference ``stage_parameters`` (valle.py:294).
    """
    def mark(path_flag):
        def go(tree):
            return jax.tree_util.tree_map(lambda _: path_flag, tree)
        return go
    if stage == 0:
        return jax.tree_util.tree_map(lambda _: True, params)
    if stage == 1:
        return {"ar": mark(True)(params["ar"]),
                "nar": mark(False)(params["nar"])}
    if stage == 2:
        return {"ar": mark(False)(params["ar"]),
                "nar": mark(True)(params["nar"])}
    raise ValueError(f"bad stage {stage}")


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def _pe_table(cfg: ValleConfig, d: int) -> jnp.ndarray:
    return emb.sine_positional_table(cfg.max_len, d)


def _text_frontend(branch_params, branch_state, cfg, text, *, branch: str,
                   rng, training, dtype):
    d = cfg.d_model if branch == "ar" else cfg.nar_d_model
    x = emb.token_embedding(branch_params["text_emb"], text, dtype=dtype)
    new_state = dict(branch_state)
    if cfg.add_prenet:
        r = None if rng is None else jax.random.fold_in(rng, 1)
        x, new_state["text_prenet"] = pre.text_prenet(
            branch_params["text_prenet"], branch_state["text_prenet"], x,
            training=training, rng=r)
    r = None if rng is None else jax.random.fold_in(rng, 2)
    pe_dropout = 0.1 if branch == "ar" else 0.0
    x = emb.apply_sine_positional(
        branch_params["text_pe"], x, _pe_table(cfg, d),
        dropout_rate=pe_dropout, rng=r, deterministic=not training)
    return x, new_state


def _ar_audio_frontend(params, cfg, y_ids, *, offset=0, rng, training, dtype):
    y = emb.token_embedding(params["ar"]["audio_emb"], y_ids, dtype=dtype)
    if cfg.add_prenet:
        r = None if rng is None else jax.random.fold_in(rng, 3)
        y = pre.audio_prenet(params["ar"]["audio_prenet"], y,
                             training=training, rng=r)
    r = None if rng is None else jax.random.fold_in(rng, 4)
    y = emb.apply_sine_positional(
        params["ar"]["audio_pe"], y, _pe_table(cfg, cfg.d_model),
        offset=offset, dropout_rate=0.1, rng=r, deterministic=not training)
    return y


def _nar_audio_post(params, cfg, y_emb, *, offset=0, rng, training):
    if cfg.add_prenet:
        r = None if rng is None else jax.random.fold_in(rng, 5)
        y_emb = pre.audio_prenet(params["nar"]["audio_prenet"], y_emb,
                                 training=training, rng=r)
    r = None if rng is None else jax.random.fold_in(rng, 6)
    return emb.apply_sine_positional(
        params["nar"]["audio_pe"], y_emb, _pe_table(cfg, cfg.nar_d_model),
        offset=offset, dropout_rate=0.1, rng=r, deterministic=not training)


def pad_y_eos(codes0: jnp.ndarray, y_mask_int: jnp.ndarray, eos_id: int,
              prepend_bos: bool, bos_id: int):
    """AR (inputs, targets) from quantizer-0 codes.

    Parity with reference valle.py:322-333: targets are the codes shifted
    with EOS at the true length; padded positions become EOS in both inputs
    and targets (no ignore_index in the AR loss, matching valle.py:877).
    """
    B, T = codes0.shape
    targets = jnp.pad(codes0, ((0, 0), (0, 1))) + eos_id * jnp.pad(
        y_mask_int, ((0, 0), (0, 1)), constant_values=1)
    if prepend_bos:
        inputs = jnp.pad(targets[:, :-1], ((0, 0), (1, 0)),
                         constant_values=bos_id)
        return inputs, targets
    return targets[:, :-1], targets[:, 1:]


def top10_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                   ignore_id: int) -> jnp.ndarray:
    """Micro top-10 accuracy with an ignored class (torchmetrics parity)."""
    k = min(10, logits.shape[-1])
    topk = jax.lax.top_k(logits.astype(jnp.float32), k)[1]  # (..., 10)
    hit = jnp.any(topk == targets[..., None], axis=-1)
    valid = targets != ignore_id
    num = jnp.sum(jnp.where(valid, hit, False).astype(jnp.float32))
    den = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return num / den


def _cross_entropy_sum(logits, targets, ignore_id=None):
    """Sum-reduced CE in fp32 (reference uses reduction='sum')."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if ignore_id is not None:
        nll = jnp.where(targets == ignore_id, 0.0, nll)
    return jnp.sum(nll)


# ---------------------------------------------------------------------------
# Forward (training / loss)
# ---------------------------------------------------------------------------


def valle_forward(
    params,
    cfg: ValleConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    train_stage: int = 0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = False,
    compute_dtype=jnp.float32,
    state: Optional[Dict] = None,
    nar_stage: Optional[jnp.ndarray] = None,
    nar_prefix_len: Optional[jnp.ndarray] = None,
    nar_prefix_starts: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict]:
    """Training forward: returns (loss_sum, metrics, new_state).

    batch keys: ``text`` (B,S) int32, ``text_lens`` (B,), ``audio`` (B,T,Q)
    int32, ``audio_lens`` (B,); for prefix_mode 4 also ``prompt_codes``
    (B,P,Q) and ``prompt_lens`` (B,) with equal entries.

    ``nar_stage`` / ``nar_prefix_len`` (prefix mode 1) /
    ``nar_prefix_starts`` (B,; prefix mode 2) override the per-step random
    draws — used by parity tests to pin the reference's host-side rng.

    metrics: ArTop10Accuracy / NarTop10Accuracy are fractions in [0,1]
    (multiply by frames to accumulate, as the trainer does — reference
    valle.py:879-881), plus ar_loss / nar_loss sums and frame counts.
    """
    if cfg.model_name == "vallf":
        return _vallf_forward(
            params, cfg, batch, train_stage=train_stage, rng=rng,
            deterministic=deterministic, compute_dtype=compute_dtype,
            state=state, nar_stage=nar_stage,
            nar_prefix_len=nar_prefix_len,
            nar_prefix_starts=nar_prefix_starts)

    state = state or {"ar": {}, "nar": {}}
    new_state = jax.tree_util.tree_map(lambda x: x, state)
    training = not deterministic
    rngs = (jax.random.split(rng, 8) if rng is not None
            else [None] * 8)

    text = batch["text"]
    x_lens = batch["text_lens"].astype(jnp.int32)
    y = batch["audio"].astype(jnp.int32)
    y_lens = batch["audio_lens"].astype(jnp.int32)
    B, S = text.shape
    T = y.shape[1]

    y_mask = jnp.arange(T)[None, :] >= y_lens[:, None]  # (B, T)
    y_mask_int = y_mask.astype(jnp.int32)
    codes = y * (1 - y_mask_int[..., None])  # zero padded frames

    ar_y, ar_targets = pad_y_eos(
        codes[..., 0], y_mask_int, cfg.eos_id, cfg.prepend_bos, cfg.bos_id)

    metrics: Dict[str, jnp.ndarray] = {}
    total_loss = jnp.float32(0.0)

    # ---------------- AR branch ----------------
    if train_stage in (0, 1):
        x, new_state["ar"] = _text_frontend(
            params["ar"], state.get("ar", {}), cfg, text, branch="ar",
            rng=rngs[0], training=training, dtype=compute_dtype)
        y_len_ar = T + int(cfg.prepend_bos)
        ar_y_lens = y_lens + int(cfg.prepend_bos)
        if cfg.attn_impl == "flash":
            bias = None
            qc, kc = M.flash_codes_ar_xy(x_lens, ar_y_lens, S, y_len_ar)
            fspec = {"qcode": qc, "kcode": kc}
        else:
            bias = M.ar_xy_attn_bias(x_lens, ar_y_lens, S, y_len_ar,
                                     dtype=jnp.float32)
            fspec = None
        y_pos = _ar_audio_frontend(
            params, cfg, ar_y, rng=rngs[1], training=training,
            dtype=compute_dtype)
        xy = jnp.concatenate([x, y_pos], axis=1)
        xy_dec = tfm.encoder_stack_apply(
            params["ar"]["decoder"], xy, bias, None,
            nhead=cfg.nhead, norm_first=cfg.norm_first,
            activation=cfg.activation, dropout_rate=cfg.dropout,
            rng=rngs[2], deterministic=deterministic, dtype=compute_dtype,
            remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16, flash_spec=fspec)
        logits = xy_dec[:, S:] @ params["ar"]["predict"]["w"].astype(
            xy_dec.dtype)  # (B, y_len_ar, V+1)
        # (prepend_bos: targets already include all y_len_ar positions)
        ar_loss = _cross_entropy_sum(logits, ar_targets)
        total_loss = total_loss + ar_loss
        metrics["ArTop10Accuracy"] = top10_accuracy(
            logits, ar_targets, ignore_id=cfg.eos_id)
        metrics["ar_loss"] = ar_loss

    if cfg.num_quantizers == 1:
        metrics["frames"] = jnp.sum(y_lens).astype(jnp.float32)
        return total_loss, metrics, new_state

    # ---------------- NAR branch ----------------
    if train_stage in (0, 2):
        nar_y = ar_y[:, 1:] if cfg.prepend_bos else ar_y  # codes0 w/ EOS pads
        if nar_stage is None:
            nar_stage = (
                jax.random.randint(rngs[3], (), 1, cfg.num_quantizers)
                if rngs[3] is not None else jnp.int32(1))
        else:
            nar_stage = jnp.asarray(nar_stage, jnp.int32)

        xn, new_state["nar"] = _text_frontend(
            params["nar"], state.get("nar", {}), cfg, text, branch="nar",
            rng=rngs[4], training=training, dtype=compute_dtype)

        nar_loss, nar_acc, nar_frames = _nar_branch(
            params, cfg, xn, x_lens, nar_y, codes, y_lens, y_mask_int,
            nar_stage, batch, rngs, training, deterministic, compute_dtype,
            prefix_len_override=nar_prefix_len,
            prefix_starts_override=nar_prefix_starts)
        total_loss = total_loss + nar_loss
        metrics["NarTop10Accuracy"] = nar_acc
        metrics["nar_loss"] = nar_loss

    if train_stage == 0:
        total_loss = total_loss / 2.0

    metrics["frames"] = jnp.sum(y_lens).astype(jnp.float32)
    return total_loss, metrics, new_state


def _nar_embedding_sum(embs_w, nar_y, codes, nar_stage, region_all_mask,
                       num_q, dtype):
    """y_emb[t] = emb0(nar_y[t]) + sum_j w_j(t) * emb_j(codes_j[t]).

    ``region_all_mask`` (B, T) True where ALL quantizers are summed (acoustic
    prompt region); elsewhere only j < nar_stage (formula (4)(5), reference
    valle.py:344,354-361).
    """
    acc = jnp.take(embs_w[0], nar_y, axis=0).astype(dtype)
    for j in range(1, num_q):
        e = jnp.take(embs_w[j], codes[..., j], axis=0).astype(dtype)
        w = jnp.where(region_all_mask, True, j < nar_stage)
        acc = acc + jnp.where(w[..., None], e, 0.0)
    return acc


def _nar_padding_mask(cfg, x_lens, y_lens, S, T):
    """(bias, flash_spec) for the NAR padding-only mask, per cfg.attn_impl."""
    if cfg.attn_impl == "flash":
        qc, kc = M.flash_codes_padding(x_lens, y_lens, S, T)
        return None, {"qcode": qc, "kcode": kc}
    return M.padding_attn_bias(x_lens, y_lens, S, T), None


def _nar_branch(params, cfg, xn, x_lens, nar_y, codes, y_lens, y_mask_int,
                nar_stage, batch, rngs, training, deterministic,
                compute_dtype, prefix_len_override=None,
                prefix_starts_override=None):
    """NAR loss for VALLE (decoder-only). Returns (loss, acc, frames)."""
    B, T = nar_y.shape
    S = xn.shape[1]
    embs_w = params["nar"]["audio_embs"]["weight"]
    V = cfg.num_audio_tokens
    total_length = jnp.sum(y_lens).astype(jnp.float32)
    pos_t = jnp.arange(T)[None, :]

    targets = (codes * jax.nn.one_hot(
        nar_stage, cfg.num_quantizers, dtype=codes.dtype)).sum(-1)
    targets = targets + V * y_mask_int  # pads -> ignore id

    if cfg.prefix_mode == 0:
        prefix_len = jnp.int32(0)
        y_emb = _nar_embedding_sum(
            embs_w, nar_y, codes, nar_stage,
            jnp.zeros((B, T), bool), cfg.num_quantizers, compute_dtype)
        y_pos = _nar_audio_post(params, cfg, y_emb, rng=rngs[5],
                                training=training)
        xy = jnp.concatenate([xn, y_pos], axis=1)
        bias, fspec = _nar_padding_mask(cfg, x_lens, y_lens, S, T)
        loss_scale = jnp.float32(1.0)
        tgt_full = targets

    elif cfg.prefix_mode == 1:
        # prefix at beginning of the SAME utterance: random length in
        # [min_len/4, min_len/2), capped at 225 (reference valle.py:346-362)
        int_low = (0.25 * jnp.min(y_lens)).astype(jnp.int32)
        if prefix_len_override is not None:
            prefix_len = jnp.asarray(prefix_len_override, jnp.int32)
        elif rngs[6] is not None:
            prefix_len = jax.random.randint(
                rngs[6], (), int_low, jnp.maximum(int_low * 2, int_low + 1))
        else:
            prefix_len = int_low
        prefix_len = jnp.minimum(prefix_len, cfg.max_prefix_len)
        region_all = pos_t < prefix_len  # (1|B, T)
        region_all = jnp.broadcast_to(region_all, (B, T))
        y_emb = _nar_embedding_sum(
            embs_w, nar_y, codes, nar_stage, region_all,
            cfg.num_quantizers, compute_dtype)
        y_pos = _nar_audio_post(params, cfg, y_emb, rng=rngs[5],
                                training=training)
        xy = jnp.concatenate([xn, y_pos], axis=1)
        bias, fspec = _nar_padding_mask(cfg, x_lens, y_lens, S, T)
        # loss only on positions >= prefix_len (reference slices targets)
        tgt_full = jnp.where(region_all, V, targets)
        loss_scale = total_length / (
            total_length - prefix_len.astype(jnp.float32) * B)

    elif cfg.prefix_mode in (2, 4):
        if cfg.prefix_mode == 2:
            P = cfg.max_prefix_len
            prefix_len = jnp.minimum(
                P, (0.25 * jnp.min(y_lens)).astype(jnp.int32))
            # random interior segment per sample (reference valle.py:366-377)
            if prefix_starts_override is not None:
                starts = jnp.asarray(prefix_starts_override, jnp.int32)
            elif rngs[6] is not None:
                starts = jax.random.randint(
                    rngs[6], (B,), 0,
                    jnp.maximum(y_lens - prefix_len + 1, 1))
            else:
                starts = jnp.zeros((B,), jnp.int32)

            def take_seg(c, s):
                return jax.lax.dynamic_slice_in_dim(c, s, P, axis=0)

            # pad codes along T so slices never go OOB; masked below anyway
            codes_pad = jnp.pad(codes, ((0, 0), (0, P), (0, 0)))
            prompt_codes = jax.vmap(take_seg)(codes_pad, starts)  # (B,P,Q)
            prompt_valid = jnp.arange(P)[None, :] < prefix_len
            # loss-mask the source region of the target stage
            in_src = (pos_t >= starts[:, None]) & (
                pos_t < starts[:, None] + prefix_len)
            tgt_full = jnp.where(in_src, V, targets)
            loss_scale = total_length / (
                total_length - prefix_len.astype(jnp.float32) * B)
            prompt_lens = jnp.broadcast_to(prefix_len, (B,))
        else:  # mode 4: neighbor-utterance prompts from the data layer
            prompt_codes = batch["prompt_codes"].astype(jnp.int32)
            P = prompt_codes.shape[1]
            prompt_lens = batch["prompt_lens"].astype(jnp.int32)
            prefix_len = prompt_lens[0]
            prompt_valid = jnp.arange(P)[None, :] < prompt_lens[:, None]
            tgt_full = targets
            loss_scale = jnp.float32(1.0)  # reference resets prefix_len=0

        prompt_codes = prompt_codes * prompt_valid[..., None]
        # prompt embedding: all quantizers summed
        p_emb = jnp.take(embs_w[0], prompt_codes[..., 0], axis=0).astype(
            compute_dtype)
        for j in range(1, cfg.num_quantizers):
            p_emb = p_emb + jnp.take(
                embs_w[j], prompt_codes[..., j], axis=0).astype(compute_dtype)
        # main region: j < nar_stage
        y_emb = _nar_embedding_sum(
            embs_w, nar_y, codes, nar_stage, jnp.zeros((B, T), bool),
            cfg.num_quantizers, compute_dtype)
        # positions: prompts at [0, prefix); y at [prefix, prefix+T)
        p_pos = _nar_audio_post(params, cfg, p_emb, offset=0, rng=rngs[5],
                                training=training)
        y_pos = _nar_audio_post(params, cfg, y_emb, offset=prefix_len,
                                rng=rngs[7], training=training)
        xy = jnp.concatenate([xn, p_pos, y_pos], axis=1)
        # bias over [text; prompt; y]
        Sp = S + P
        kk = jnp.arange(Sp + T)[None, :]
        key_valid = jnp.where(
            kk < S, kk < x_lens[:, None],
            jnp.where(kk < Sp, (kk - S) < prompt_lens[:, None],
                      (kk - Sp) < y_lens[:, None]))
        if cfg.attn_impl == "flash":
            bias = None
            qc, kc = M.flash_codes_key_valid(key_valid)
            fspec = {"qcode": qc, "kcode": kc}
        else:
            bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(jnp.float32)[
                :, None, None, :]
            fspec = None
    else:
        raise ValueError(f"unsupported prefix_mode {cfg.prefix_mode}")

    cond = jnp.take(params["nar"]["stage_embs"]["weight"],
                    nar_stage - 1, axis=0)[None, :]  # (1, nd)
    stack_rng = (None if rngs[5] is None
                 else jax.random.fold_in(rngs[5], 1 << 20))
    xy_dec = tfm.encoder_stack_apply(
        params["nar"]["decoder"], xy, bias, cond,
        nhead=cfg.nar_nhead, norm_first=cfg.norm_first,
        activation=cfg.activation, dropout_rate=cfg.dropout,
        rng=stack_rng, deterministic=deterministic, dtype=compute_dtype,
        remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16, flash_spec=fspec)
    y_dec = xy_dec[:, -T:]  # the y region is always the trailing T positions

    W = nar_predict_weights(params, cfg)  # (Q-1, nd, V)
    Wj = (W * jax.nn.one_hot(nar_stage - 1, cfg.num_quantizers - 1,
                             dtype=W.dtype)[:, None, None]).sum(0)
    logits = y_dec @ Wj.astype(y_dec.dtype)  # (B, T, V)

    nar_loss = _cross_entropy_sum(logits, tgt_full, ignore_id=V) * loss_scale
    nar_acc = top10_accuracy(logits, tgt_full, ignore_id=V)
    return nar_loss, nar_acc, total_length


def valle_ar_forward_packed(
    params,
    cfg: ValleConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    train_stage: int = 1,
    rng: Optional[jax.Array] = None,
    deterministic: bool = False,
    compute_dtype=jnp.float32,
    state: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict]:
    """AR training forward over SEQUENCE-PACKED rows.

    TPU-native throughput path for AR-stage training (no reference
    counterpart — the reference approximates it with duration-bucketed
    dynamic batching, ``valle/data/datamodule.py:324-333``): several short
    utterances share one fixed-shape row, cutting padding waste and
    keeping ONE compiled shape for the whole epoch.

    batch keys (built by ``data.packing.collate_packed``):
      ``text`` (B, S) int32 ids, ``text_seg``/``text_pos`` (B, S),
      ``ar_inputs``/``ar_targets`` (B, T) with -1 at padding targets,
      ``audio_seg``/``audio_pos`` (B, T), ``row_frames`` (B,).

    Per segment the math matches ``valle_forward``'s AR branch exactly
    (tested: packed loss == sum of exact-length unpacked losses); the loss
    differs from a PADDED unpacked batch only in that the reference also
    counts EOS-after-EOS padding positions (valle.py:877 uses no
    ignore_index) — packing has no such positions to count.
    """
    assert train_stage in (0, 1), "packed forward is AR-only"
    if cfg.add_prenet:
        raise NotImplementedError("packed AR rows do not support prenets")
    state = state or {"ar": {}, "nar": {}}
    training = not deterministic
    rngs = (jax.random.split(rng, 4) if rng is not None else [None] * 4)
    d = cfg.d_model
    pe_table = _pe_table(cfg, d)

    text = batch["text"].astype(jnp.int32)
    text_seg = batch["text_seg"].astype(jnp.int32)
    ar_inputs = batch["ar_inputs"].astype(jnp.int32)
    ar_targets = batch["ar_targets"].astype(jnp.int32)
    audio_seg = batch["audio_seg"].astype(jnp.int32)

    x = emb.token_embedding(params["ar"]["text_emb"], text,
                            dtype=compute_dtype)
    x = emb.apply_sine_positional_gather(
        params["ar"]["text_pe"], x, pe_table, batch["text_pos"],
        dropout_rate=0.1, rng=rngs[0], deterministic=not training)
    y = emb.token_embedding(params["ar"]["audio_emb"], ar_inputs,
                            dtype=compute_dtype)
    y = emb.apply_sine_positional_gather(
        params["ar"]["audio_pe"], y, pe_table, batch["audio_pos"],
        dropout_rate=0.1, rng=rngs[1], deterministic=not training)

    if cfg.attn_impl == "flash":
        bias = None
        qc, kc, qs, ks = M.flash_codes_packed_ar(text_seg, audio_seg)
        fspec = {"qcode": qc, "kcode": kc, "qseg": qs, "kseg": ks,
                 "add_diag": True}
    else:
        bias = M.packed_ar_attn_bias(text_seg, audio_seg)
        fspec = None
    xy = jnp.concatenate([x, y], axis=1)
    xy_dec = tfm.encoder_stack_apply(
        params["ar"]["decoder"], xy, bias, None,
        nhead=cfg.nhead, norm_first=cfg.norm_first,
        activation=cfg.activation, dropout_rate=cfg.dropout,
        rng=rngs[2], deterministic=deterministic, dtype=compute_dtype,
        remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16, flash_spec=fspec)
    S = text.shape[1]
    logits = xy_dec[:, S:] @ params["ar"]["predict"]["w"].astype(
        xy_dec.dtype)  # (B, T, V+1)

    valid = ar_targets >= 0
    tgt = jnp.maximum(ar_targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    ar_loss = jnp.sum(jnp.where(valid, nll, 0.0))

    k = min(10, logits.shape[-1])
    topk = jax.lax.top_k(logits.astype(jnp.float32), k)[1]
    hit = jnp.any(topk == tgt[..., None], axis=-1)
    metric_valid = valid & (tgt != cfg.eos_id)
    num = jnp.sum(jnp.where(metric_valid, hit, False).astype(jnp.float32))
    den = jnp.maximum(jnp.sum(metric_valid.astype(jnp.float32)), 1.0)

    metrics = {
        "ArTop10Accuracy": num / den,
        "ar_loss": ar_loss,
        "frames": jnp.sum(batch["row_frames"]).astype(jnp.float32),
        "utterances": jnp.sum(
            jnp.max(audio_seg, axis=1) + 1).astype(jnp.float32),
    }
    return ar_loss, metrics, state


def valle_nar_forward_packed(
    params,
    cfg: ValleConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    train_stage: int = 2,
    rng: Optional[jax.Array] = None,
    deterministic: bool = False,
    compute_dtype=jnp.float32,
    state: Optional[Dict] = None,
    nar_stage: Optional[jnp.ndarray] = None,
    nar_prefix_len: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict]:
    """NAR training forward over SEQUENCE-PACKED rows (prefix modes 0/1).

    TPU-native throughput path for NAR-stage training — the stage that
    dominates the reference recipe's wall clock (epochs 3..40,
    /root/reference/README.md:106-112). Several utterances share one
    fixed-shape bidirectional row under a same-segment block mask
    (``ops.masks.packed_nar_attn_bias``); ONE compiled shape for the
    whole stage. No reference counterpart (its dynamic bucketing pads to
    the batch max, valle/data/datamodule.py:324-333).

    batch keys (built by ``data.packing.PackedNarSpeechDataset``):
      ``text`` (B, S) int32 ids, ``text_seg``/``text_pos`` (B, S),
      ``nar_codes`` (B, T, Q) int32 with zeros at padding,
      ``audio_seg``/``audio_pos`` (B, T), ``seg_frames`` (B, K) int32
      per-row segment lengths (0 for empty slots), ``row_frames`` (B,).

    Per segment the math matches ``valle_forward``'s NAR branch exactly
    (prefix mode 1: ONE shared prefix_len per step drawn from
    [min_len/4, min_len/2) over ALL packed segments, capped at
    max_prefix_len — the packed batch is "the batch" of the reference
    draw, valle.py:346-362; loss rescaled by total/(total - prefix*n_seg)
    with n_seg the packed segment count standing in for B). Tested:
    packed loss == the bucketed forward's loss over the same utterances
    (tests/test_packing.py).

    ``nar_stage`` / ``nar_prefix_len`` override the in-model random draws
    (parity tests); training draws them from ``rng`` like valle_forward.
    """
    assert train_stage == 2, "packed NAR forward is NAR-stage only"
    if cfg.add_prenet:
        raise NotImplementedError("packed NAR rows do not support prenets")
    if cfg.prefix_mode not in (0, 1):
        raise NotImplementedError(
            "packed NAR supports prefix modes 0/1 (modes 2/4 splice "
            "prompt segments; use the bucketed path)")
    state = state or {"ar": {}, "nar": {}}
    training = not deterministic
    rngs = (jax.random.split(rng, 8) if rng is not None else [None] * 8)
    nd = cfg.nar_d_model
    pe_table = _pe_table(cfg, nd)
    V = cfg.num_audio_tokens
    Q = cfg.num_quantizers

    text = batch["text"].astype(jnp.int32)
    text_seg = batch["text_seg"].astype(jnp.int32)
    codes = batch["nar_codes"].astype(jnp.int32)
    audio_seg = batch["audio_seg"].astype(jnp.int32)
    audio_pos = batch["audio_pos"].astype(jnp.int32)
    seg_frames = batch["seg_frames"].astype(jnp.int32)
    B, T, _ = codes.shape

    if nar_stage is None:
        nar_stage = (jax.random.randint(rngs[3], (), 1, Q)
                     if rngs[3] is not None else jnp.int32(1))
    else:
        nar_stage = jnp.asarray(nar_stage, jnp.int32)

    real_seg = seg_frames > 0
    n_seg = jnp.sum(real_seg).astype(jnp.float32)
    total = jnp.sum(seg_frames).astype(jnp.float32)

    if cfg.prefix_mode == 1:
        # one shared prefix_len per step over ALL packed segments
        # (reference draws one per batch from min(y_lens), valle.py:346)
        min_len = jnp.min(jnp.where(real_seg, seg_frames, jnp.int32(1 << 30)))
        int_low = (0.25 * min_len).astype(jnp.int32)
        if nar_prefix_len is not None:
            prefix_len = jnp.asarray(nar_prefix_len, jnp.int32)
        elif rngs[6] is not None:
            prefix_len = jax.random.randint(
                rngs[6], (), int_low, jnp.maximum(int_low * 2, int_low + 1))
        else:
            prefix_len = int_low
        prefix_len = jnp.minimum(prefix_len, cfg.max_prefix_len)
    else:
        prefix_len = jnp.int32(0)

    seg_valid = audio_seg >= 0
    region_all = (audio_pos < prefix_len) & seg_valid  # acoustic prompt

    # frontends (gather-PE: every segment restarts its positions at 0)
    x = emb.token_embedding(params["nar"]["text_emb"], text,
                            dtype=compute_dtype)
    x = emb.apply_sine_positional_gather(
        params["nar"]["text_pe"], x, pe_table, batch["text_pos"],
        dropout_rate=0.0, rng=rngs[4], deterministic=not training)
    y_emb = _nar_embedding_sum(
        params["nar"]["audio_embs"]["weight"], codes[..., 0], codes,
        nar_stage, region_all, Q, compute_dtype)
    y = emb.apply_sine_positional_gather(
        params["nar"]["audio_pe"], y_emb, pe_table, audio_pos,
        dropout_rate=0.1, rng=rngs[5], deterministic=not training)

    if cfg.attn_impl == "flash":
        bias = None
        qc, kc, qs, ks = M.flash_codes_packed_nar(text_seg, audio_seg)
        fspec = {"qcode": qc, "kcode": kc, "qseg": qs, "kseg": ks,
                 "add_diag": True}
    else:
        bias = M.packed_nar_attn_bias(text_seg, audio_seg)
        fspec = None
    cond = jnp.take(params["nar"]["stage_embs"]["weight"],
                    nar_stage - 1, axis=0)[None, :]  # (1, nd)
    stack_rng = (None if rngs[5] is None
                 else jax.random.fold_in(rngs[5], 1 << 20))
    xy = jnp.concatenate([x, y], axis=1)
    xy_dec = tfm.encoder_stack_apply(
        params["nar"]["decoder"], xy, bias, cond,
        nhead=cfg.nar_nhead, norm_first=cfg.norm_first,
        activation=cfg.activation, dropout_rate=cfg.dropout,
        rng=stack_rng, deterministic=deterministic, dtype=compute_dtype,
        remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16, flash_spec=fspec)
    y_dec = xy_dec[:, -T:]

    W = nar_predict_weights(params, cfg)  # (Q-1, nd, V)
    Wj = (W * jax.nn.one_hot(nar_stage - 1, Q - 1,
                             dtype=W.dtype)[:, None, None]).sum(0)
    logits = y_dec @ Wj.astype(y_dec.dtype)  # (B, T, V)

    targets = (codes * jax.nn.one_hot(
        nar_stage, Q, dtype=codes.dtype)).sum(-1)
    tgt_full = jnp.where(region_all | ~seg_valid, V, targets)
    loss_scale = (total / jnp.maximum(
        total - prefix_len.astype(jnp.float32) * n_seg, 1.0)
        if cfg.prefix_mode == 1 else jnp.float32(1.0))
    nar_loss = _cross_entropy_sum(logits, tgt_full, ignore_id=V) * loss_scale

    metrics = {
        "NarTop10Accuracy": top10_accuracy(logits, tgt_full, ignore_id=V),
        "nar_loss": nar_loss,
        "frames": total,
        "utterances": n_seg,
    }
    return nar_loss, metrics, state


def valle_visualize_outputs(params, cfg, batch, state=None):
    """(encoder output, codes) for the trainer's --visualize.

    Matches what the reference feeds its visualizer: the NAR text-frontend
    output (embedding + prenet + positional encoding, valle.py:897-899) as
    `predicts[0]` and the codes as `predicts[1]` (valle.py:954/962 returns
    ``(x, codes)``).
    """
    state = state or {"ar": {}, "nar": {}}
    branch = "nar" if cfg.num_quantizers > 1 else "ar"
    xn, _ = _text_frontend(
        params[branch], state.get(branch, {}), cfg, batch["text"],
        branch=branch, rng=None, training=False, dtype=jnp.float32)
    return xn, batch["audio"]


def _vallf_forward(params, cfg, batch, *, train_stage, rng, deterministic,
                   compute_dtype, state, nar_stage=None,
                   nar_prefix_len=None, nar_prefix_starts=None):
    """VALL-F: text encodes as cross-attention memory (reference valle.py:395)."""
    state = state or {"ar": {}, "nar": {}}
    new_state = jax.tree_util.tree_map(lambda x: x, state)
    training = not deterministic
    rngs = (jax.random.split(rng, 8) if rng is not None else [None] * 8)

    text = batch["text"]
    x_lens = batch["text_lens"].astype(jnp.int32)
    y = batch["audio"].astype(jnp.int32)
    y_lens = batch["audio_lens"].astype(jnp.int32)
    B, S = text.shape
    T = y.shape[1]

    y_mask = jnp.arange(T)[None, :] >= y_lens[:, None]
    y_mask_int = y_mask.astype(jnp.int32)
    codes = y * (1 - y_mask_int[..., None])
    ar_y, ar_targets = pad_y_eos(
        codes[..., 0], y_mask_int, cfg.eos_id, cfg.prepend_bos, cfg.bos_id)

    metrics: Dict[str, jnp.ndarray] = {}
    total_loss = jnp.float32(0.0)

    if train_stage in (0, 1):
        x, new_state["ar"] = _text_frontend(
            params["ar"], state.get("ar", {}), cfg, text, branch="ar",
            rng=rngs[0], training=training, dtype=compute_dtype)
        y_len_ar = T + int(cfg.prepend_bos)
        ar_y_lens = y_lens + int(cfg.prepend_bos)
        self_bias = (M.causal_bias(y_len_ar) +
                     M.key_padding_bias(ar_y_lens, y_len_ar))
        cross_bias = M.key_padding_bias(x_lens, S)
        y_pos = _ar_audio_frontend(
            params, cfg, ar_y, rng=rngs[1], training=training,
            dtype=compute_dtype)
        y_dec = tfm.decoder_stack_apply(
            params["ar"]["decoder"], y_pos, x, self_bias, cross_bias, None,
            nhead=cfg.nhead, norm_first=cfg.norm_first,
            activation=cfg.activation, dropout_rate=cfg.dropout,
            rng=rngs[2], deterministic=deterministic, dtype=compute_dtype,
            remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16)
        logits = y_dec @ params["ar"]["predict"]["w"].astype(y_dec.dtype)
        ar_loss = _cross_entropy_sum(logits, ar_targets)
        total_loss = total_loss + ar_loss
        metrics["ArTop10Accuracy"] = top10_accuracy(
            logits, ar_targets, ignore_id=cfg.eos_id)
        metrics["ar_loss"] = ar_loss

    if cfg.num_quantizers == 1:
        metrics["frames"] = jnp.sum(y_lens).astype(jnp.float32)
        return total_loss, metrics, new_state

    if train_stage in (0, 2):
        nar_y = ar_y[:, 1:] if cfg.prepend_bos else ar_y
        if nar_stage is None:
            nar_stage = (
                jax.random.randint(rngs[3], (), 1, cfg.num_quantizers)
                if rngs[3] is not None else jnp.int32(1))
        else:
            nar_stage = jnp.asarray(nar_stage, jnp.int32)
        xn, new_state["nar"] = _text_frontend(
            params["nar"], state.get("nar", {}), cfg, text, branch="nar",
            rng=rngs[4], training=training, dtype=compute_dtype)
        nar_loss, nar_acc, _ = _nar_branch_vallf(
            params, cfg, xn, x_lens, nar_y, codes, y_lens, y_mask_int,
            nar_stage, batch, rngs, training, deterministic, compute_dtype,
            prefix_len_override=nar_prefix_len,
            prefix_starts_override=nar_prefix_starts)
        total_loss = total_loss + nar_loss
        metrics["NarTop10Accuracy"] = nar_acc
        metrics["nar_loss"] = nar_loss

    if train_stage == 0:
        total_loss = total_loss / 2.0
    metrics["frames"] = jnp.sum(y_lens).astype(jnp.float32)
    return total_loss, metrics, new_state


def _nar_branch_vallf(params, cfg, xn, x_lens, nar_y, codes, y_lens,
                      y_mask_int, nar_stage, batch, rngs, training,
                      deterministic, compute_dtype,
                      prefix_len_override=None, prefix_starts_override=None):
    """VALL-F NAR: same prompt logic, decoder cross-attends to text."""
    B, T = nar_y.shape
    S = xn.shape[1]
    embs_w = params["nar"]["audio_embs"]["weight"]
    V = cfg.num_audio_tokens
    total_length = jnp.sum(y_lens).astype(jnp.float32)
    pos_t = jnp.arange(T)[None, :]
    targets = (codes * jax.nn.one_hot(
        nar_stage, cfg.num_quantizers, dtype=codes.dtype)).sum(-1)
    targets = targets + V * y_mask_int

    cross_bias = M.key_padding_bias(x_lens, S)

    if cfg.prefix_mode == 0:
        y_emb = _nar_embedding_sum(embs_w, nar_y, codes, nar_stage,
                                   jnp.zeros((B, T), bool),
                                   cfg.num_quantizers, compute_dtype)
        y_pos = _nar_audio_post(params, cfg, y_emb, rng=rngs[5],
                                training=training)
        self_bias = M.key_padding_bias(y_lens, T)
        tgt_full = targets
        loss_scale = jnp.float32(1.0)
        seq = y_pos
        prefix_len = jnp.int32(0)
    elif cfg.prefix_mode == 1:
        int_low = (0.25 * jnp.min(y_lens)).astype(jnp.int32)
        if prefix_len_override is not None:
            prefix_len = jnp.asarray(prefix_len_override, jnp.int32)
        elif rngs[6] is not None:
            prefix_len = jax.random.randint(
                rngs[6], (), int_low, jnp.maximum(int_low * 2, int_low + 1))
        else:
            prefix_len = int_low
        prefix_len = jnp.minimum(prefix_len, cfg.max_prefix_len)
        region_all = jnp.broadcast_to(pos_t < prefix_len, (B, T))
        y_emb = _nar_embedding_sum(embs_w, nar_y, codes, nar_stage,
                                   region_all, cfg.num_quantizers,
                                   compute_dtype)
        y_pos = _nar_audio_post(params, cfg, y_emb, rng=rngs[5],
                                training=training)
        self_bias = M.key_padding_bias(y_lens, T)
        tgt_full = jnp.where(region_all, V, targets)
        loss_scale = total_length / (
            total_length - prefix_len.astype(jnp.float32) * B)
        seq = y_pos
    elif cfg.prefix_mode in (2, 4):
        if cfg.prefix_mode == 2:
            P = cfg.max_prefix_len
            prefix_len = jnp.minimum(
                P, (0.25 * jnp.min(y_lens)).astype(jnp.int32))
            if prefix_starts_override is not None:
                starts = jnp.asarray(prefix_starts_override, jnp.int32)
            elif rngs[6] is not None:
                starts = jax.random.randint(
                    rngs[6], (B,), 0, jnp.maximum(y_lens - prefix_len + 1, 1))
            else:
                starts = jnp.zeros((B,), jnp.int32)
            codes_pad = jnp.pad(codes, ((0, 0), (0, P), (0, 0)))
            prompt_codes = jax.vmap(
                lambda c, s: jax.lax.dynamic_slice_in_dim(c, s, P, axis=0)
            )(codes_pad, starts)
            prompt_valid = jnp.arange(P)[None, :] < prefix_len
            in_src = (pos_t >= starts[:, None]) & (
                pos_t < starts[:, None] + prefix_len)
            tgt_full = jnp.where(in_src, V, targets)
            loss_scale = total_length / (
                total_length - prefix_len.astype(jnp.float32) * B)
            prompt_lens = jnp.broadcast_to(prefix_len, (B,))
        else:
            prompt_codes = batch["prompt_codes"].astype(jnp.int32)
            P = prompt_codes.shape[1]
            prompt_lens = batch["prompt_lens"].astype(jnp.int32)
            prefix_len = prompt_lens[0]
            prompt_valid = jnp.arange(P)[None, :] < prompt_lens[:, None]
            tgt_full = targets
            loss_scale = jnp.float32(1.0)
        prompt_codes = prompt_codes * prompt_valid[..., None]
        p_emb = jnp.take(embs_w[0], prompt_codes[..., 0], axis=0).astype(
            compute_dtype)
        for j in range(1, cfg.num_quantizers):
            p_emb = p_emb + jnp.take(
                embs_w[j], prompt_codes[..., j], axis=0).astype(compute_dtype)
        y_emb = _nar_embedding_sum(embs_w, nar_y, codes, nar_stage,
                                   jnp.zeros((B, T), bool),
                                   cfg.num_quantizers, compute_dtype)
        p_pos = _nar_audio_post(params, cfg, p_emb, offset=0, rng=rngs[5],
                                training=training)
        y_pos = _nar_audio_post(params, cfg, y_emb, offset=prefix_len,
                                rng=rngs[7], training=training)
        seq = jnp.concatenate([p_pos, y_pos], axis=1)
        kk = jnp.arange(P + T)[None, :]
        key_valid = jnp.where(kk < P, kk < prompt_lens[:, None],
                              (kk - P) < y_lens[:, None])
        self_bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(
            jnp.float32)[:, None, None, :]
    else:
        raise ValueError(f"unsupported prefix_mode {cfg.prefix_mode}")

    cond = jnp.take(params["nar"]["stage_embs"]["weight"],
                    nar_stage - 1, axis=0)[None, :]
    stack_rng = (None if rngs[5] is None
                 else jax.random.fold_in(rngs[5], 1 << 20))
    y_dec = tfm.decoder_stack_apply(
        params["nar"]["decoder"], seq, xn, self_bias, cross_bias, cond,
        nhead=cfg.nar_nhead, norm_first=cfg.norm_first,
        activation=cfg.activation, dropout_rate=cfg.dropout,
        rng=stack_rng, deterministic=deterministic, dtype=compute_dtype,
        remat=(cfg.remat if training else False),
        score_bf16=cfg.attn_score_bf16)
    y_dec = y_dec[:, -T:]
    W = nar_predict_weights(params, cfg)
    Wj = (W * jax.nn.one_hot(nar_stage - 1, cfg.num_quantizers - 1,
                             dtype=W.dtype)[:, None, None]).sum(0)
    logits = y_dec @ Wj.astype(y_dec.dtype)
    nar_loss = _cross_entropy_sum(logits, tgt_full, ignore_id=V) * loss_scale
    nar_acc = top10_accuracy(logits, tgt_full, ignore_id=V)
    return nar_loss, nar_acc, total_length
