"""Attention-mask construction as additive biases (static shapes).

The reference builds boolean masks and merges key-padding per-head into a
float -inf mask on every forward (``valle/models/valle.py:835-861``). Here we
build a single additive bias array ``(B, 1, S, S)`` once per step from the
lengths — XLA folds the adds into the attention kernel, and no per-head
expansion is materialized.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = float("-inf")


def ar_xy_attn_bias(
    x_lens: jnp.ndarray,
    y_lens: jnp.ndarray,
    x_len: int,
    y_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Composite AR mask for the concatenated ``[text; audio]`` sequence.

    Parity with reference ``valle/models/valle.py:835-861``: the text block is
    fully visible (bidirectional), the audio block is causal, audio rows see
    all text, text rows see no audio; padded keys (per the lengths) are
    masked everywhere.

    Returns an additive bias of shape (B, 1, S, S), S = x_len + y_len, with
    0 at visible positions and -inf at masked ones.
    """
    S = x_len + y_len
    pos = jnp.arange(S)
    is_y = pos >= x_len  # (S,) query/key in audio region?

    # Structure: query q may attend key k iff
    #   (q in text and k in text) or (q in audio and (k in text or k <= q))
    q = pos[:, None]
    k = pos[None, :]
    text_q_ok = (~is_y[:, None]) & (~is_y[None, :])
    audio_q_ok = is_y[:, None] & ((~is_y[None, :]) | (k <= q))
    visible = text_q_ok | audio_q_ok  # (S, S)

    # Key padding: key k valid iff (k < x_lens[b]) in text, or
    # (k - x_len < y_lens[b]) in audio.
    kk = pos[None, :]
    key_valid = jnp.where(
        kk < x_len,
        kk < x_lens[:, None],
        (kk - x_len) < y_lens[:, None],
    )  # (B, S)

    mask = visible[None, :, :] & key_valid[:, None, :]
    bias = jnp.where(mask, 0.0, NEG_INF).astype(dtype)
    return bias[:, None, :, :]


def padding_attn_bias(
    x_lens: jnp.ndarray,
    y_lens: jnp.ndarray,
    x_len: int,
    y_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Bidirectional (NAR) bias over ``[text; audio]``: only padded keys masked.

    Parity with the NAR branch's ``src_key_padding_mask``
    (reference ``valle/models/valle.py:920-925``). Shape (B, 1, 1, S).
    """
    S = x_len + y_len
    kk = jnp.arange(S)[None, :]
    key_valid = jnp.where(
        kk < x_len,
        kk < x_lens[:, None],
        (kk - x_len) < y_lens[:, None],
    )
    bias = jnp.where(key_valid, 0.0, NEG_INF).astype(dtype)
    return bias[:, None, None, :]


def packed_ar_attn_bias(
    text_seg: jnp.ndarray,
    audio_seg: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """AR mask for SEQUENCE-PACKED ``[text; audio]`` rows.

    Packing puts several utterances in one row (a TPU-native throughput
    lever the reference's dynamic batching approximates with duration
    buckets, ``valle/data/datamodule.py:324-333``). ``text_seg`` (B, S) and
    ``audio_seg`` (B, T) carry per-position segment ids (-1 = padding).

    Per segment the structure matches :func:`ar_xy_attn_bias`: text is
    bidirectional within its own segment, audio attends its segment's text
    and causally its own audio; nothing crosses segments. The diagonal is
    always visible so padded query rows stay finite (their outputs are
    dropped by the loss mask).

    Returns (B, 1, S+T, S+T) additive bias.
    """
    seg = jnp.concatenate([text_seg, audio_seg], axis=1)  # (B, St)
    S = text_seg.shape[1]
    St = seg.shape[1]
    pos = jnp.arange(St)
    is_y = pos >= S

    same_seg = (seg[:, :, None] == seg[:, None, :]) & (
        seg[:, :, None] >= 0)  # (B, q, k)
    q = pos[:, None]
    k = pos[None, :]
    text_q_ok = (~is_y[:, None]) & (~is_y[None, :])
    audio_q_ok = is_y[:, None] & ((~is_y[None, :]) | (k <= q))
    structure = text_q_ok | audio_q_ok  # (St, St)

    visible = (same_seg & structure[None]) | (q == k)[None]
    return jnp.where(visible, 0.0, NEG_INF).astype(dtype)[:, None, :, :]


def packed_nar_attn_bias(
    text_seg: jnp.ndarray,
    audio_seg: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """NAR mask for SEQUENCE-PACKED ``[text; audio]`` rows.

    The NAR stack attends BIDIRECTIONALLY over the whole ``[text; audio]``
    sequence (reference valle.py:889-954 builds key-padding masks only);
    the packed equivalent is plain same-segment visibility — each
    position sees every text and audio position of its OWN segment, in
    both directions, and nothing else. The diagonal stays visible so
    padded query rows remain finite (their outputs are loss-masked).

    Returns (B, 1, S+T, S+T) additive bias.
    """
    seg = jnp.concatenate([text_seg, audio_seg], axis=1)  # (B, St)
    St = seg.shape[1]
    same_seg = (seg[:, :, None] == seg[:, None, :]) & (
        seg[:, :, None] >= 0)  # (B, q, k)
    eye = jnp.eye(St, dtype=bool)[None]
    visible = same_seg | eye
    return jnp.where(visible, 0.0, NEG_INF).astype(dtype)[:, None, :, :]


# ---------------------------------------------------------------------------
# Flash-kernel visibility codes
#
# The fused training-attention kernel (ops/flash_mha.py) rebuilds each mask
# in VMEM from per-position int32 codes instead of streaming an additive
# bias array: query i sees key j iff ``kcode[j] <= qcode[i]`` (plus
# same-segment when packed). Every builder below is the code-form twin of
# the bias builder above it; tests/test_flash_mha.py pins the equivalence.
# ---------------------------------------------------------------------------


def flash_codes_ar_xy(x_lens, y_lens, x_len: int, y_len: int):
    """Code-form twin of :func:`ar_xy_attn_bias`.

    Text positions carry code 0 (bidirectional prefix); audio position t
    carries code t+1 so ``kcode <= qcode`` is exactly the causal rule;
    padded keys get CODE_INVALID. Returns (qcode (B,S), kcode (B,S)) int32.
    """
    from .flash_mha import CODE_INVALID

    S = x_len + y_len
    pos = jnp.arange(S, dtype=jnp.int32)
    base = jnp.where(pos < x_len, 0, pos - x_len + 1)        # (S,)
    B = x_lens.shape[0]
    qcode = jnp.broadcast_to(base, (B, S))
    kk = pos[None, :]
    key_valid = jnp.where(
        kk < x_len, kk < x_lens[:, None], (kk - x_len) < y_lens[:, None])
    kcode = jnp.where(key_valid, base[None, :], CODE_INVALID)
    return qcode, kcode.astype(jnp.int32)


def flash_codes_padding(x_lens, y_lens, x_len: int, y_len: int):
    """Code-form twin of :func:`padding_attn_bias` (NAR: padded keys only)."""
    from .flash_mha import CODE_INVALID

    S = x_len + y_len
    kk = jnp.arange(S, dtype=jnp.int32)[None, :]
    key_valid = jnp.where(
        kk < x_len, kk < x_lens[:, None], (kk - x_len) < y_lens[:, None])
    B = x_lens.shape[0]
    qcode = jnp.zeros((B, S), jnp.int32)
    kcode = jnp.where(key_valid, 0, CODE_INVALID).astype(jnp.int32)
    return qcode, kcode


def flash_codes_key_valid(key_valid):
    """Codes from an explicit (B, T) key-validity mask (e.g. the NAR
    prefix-mode 2/4 three-region [text; prompt; y] padding mask)."""
    from .flash_mha import CODE_INVALID

    B, T = key_valid.shape
    qcode = jnp.zeros((B, T), jnp.int32)
    kcode = jnp.where(key_valid, 0, CODE_INVALID).astype(jnp.int32)
    return qcode, kcode


def flash_codes_packed_ar(text_seg, audio_seg):
    """Code+segment twin of :func:`packed_ar_attn_bias`.

    Returns (qcode, kcode, qseg, kseg); the kernel must be called with
    ``add_diag=True`` (the packed masks keep the diagonal visible so
    padded rows stay finite).
    """
    S = text_seg.shape[1]
    seg = jnp.concatenate([text_seg, audio_seg], axis=1).astype(jnp.int32)
    St = seg.shape[1]
    pos = jnp.arange(St, dtype=jnp.int32)
    base = jnp.where(pos < S, 0, pos + 1)    # audio: global order, 1-based
    B = seg.shape[0]
    qcode = jnp.broadcast_to(base, (B, St))
    kcode = qcode
    # padding (seg < 0): qseg/kseg forced unequal so only the diagonal shows
    qseg = jnp.where(seg >= 0, seg, -1)
    kseg = jnp.where(seg >= 0, seg, -2)
    return qcode, kcode, qseg, kseg


def flash_codes_packed_nar(text_seg, audio_seg):
    """Code+segment twin of :func:`packed_nar_attn_bias` (add_diag=True)."""
    seg = jnp.concatenate([text_seg, audio_seg], axis=1).astype(jnp.int32)
    B, St = seg.shape
    qcode = jnp.zeros((B, St), jnp.int32)
    qseg = jnp.where(seg >= 0, seg, -1)
    kseg = jnp.where(seg >= 0, seg, -2)
    return qcode, qcode, qseg, kseg


def causal_bias(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) inclusive-causal (each query sees keys k <= q) additive bias."""
    q = jnp.arange(T)[:, None]
    k = jnp.arange(T)[None, :]
    return jnp.where(k <= q, 0.0, NEG_INF).astype(dtype)[None, None]


def key_padding_bias(lens: jnp.ndarray, T: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, 1, T) bias masking padded keys."""
    kk = jnp.arange(T)[None, :]
    return jnp.where(kk < lens[:, None], 0.0, NEG_INF).astype(dtype)[
        :, None, None, :
    ]
