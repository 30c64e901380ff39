"""Batched zero-shot TTS serving.

The reference has NO serving layer — inference is a batch-size-1 CLI
(SURVEY §1 notes; reference valle/models/valle.py:989 asserts B == 1).
This module goes beyond parity: a `Synthesizer` that batches concurrent
requests onto static shape buckets and runs the KV-cache decode once per
batch, amortizing the model across requests.

Shapes are bucketed (text to multiples of 16, prompts to the 3 s cap,
generation length to a fixed grid) so a serving process compiles a small,
bounded set of programs and then serves any traffic.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import List, Optional, Sequence

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class SynthesisRequest:
    text: str
    prompt_text: str = ""
    prompt_wav: Optional[str] = None           # path
    prompt_codes: Optional[np.ndarray] = None  # (P, Q) precomputed


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray          # (T,) float32 @ 24 kHz
    codes: np.ndarray        # (F, Q)
    frames: int


def resolve_nar_score_bf16(mode, compute_dtype) -> bool:
    """Resolve the NAR score-dtype policy: "auto" enables bf16 score
    storage whenever compute is bf16 (the policy is inert at fp32 —
    models.inference.valle_nar_decode). Accepts bools for convenience."""
    if isinstance(mode, bool):
        return mode
    if mode not in ("auto", "on", "off"):
        raise ValueError(
            f"nar_score_bf16 must be 'auto'|'on'|'off'|bool: {mode!r}")
    if mode == "auto":
        import jax.numpy as jnp

        return bool(jnp.dtype(compute_dtype) == jnp.bfloat16)
    return mode == "on"


def resolve_nar_attn_impl(mode: str, B: int,
                          model_name: str = "valle") -> str:
    """Resolve the NAR-refinement-pass attention implementation for a
    batch of B rows. "auto" = the measured winner (round-5
    `bench_nar_infer.py`, flagship shapes, one session): the fused flash
    kernel at B <= 8 (22.8k vs 21.3k frames/s at B=8 — no S×S HBM
    round-trip) and the einsum path above it (23.2k vs 22.2k at B=32 —
    at large batch the bf16-score einsum keeps the MXU fed and the
    kernel's f32 in-VMEM scores stop paying). Non-TPU backends and
    vallf always resolve to einsum. Token fidelity is gated like
    nar_score_bf16 (trained-weights >=98% agreement + fp32 exactness,
    tests/test_training_convergence.py)."""
    if mode in ("einsum", "flash"):
        return mode
    if mode != "auto":
        raise ValueError(f"nar_attn_impl must be auto|einsum|flash: {mode}")
    if model_name == "vallf":
        return "einsum"
    import jax

    if jax.default_backend() != "tpu":
        return "einsum"
    return "flash" if B <= 8 else "einsum"


def plan_groups(reqs: Sequence["SynthesisRequest"],
                group_size: int) -> List[List[int]]:
    """Throughput-oriented batch plan: indices sorted by text length,
    longest first, split into ``group_size`` batches.

    The AR generation cap is 16x the text-token length (reference stop
    rule), so a batch's decode budget tracks its LONGEST request;
    grouping like-length requests keeps short lanes from idling behind a
    long one, and running the longest group first shortens the overall
    tail (LPT scheduling). Measured winner for OFFLINE batches
    (BASELINE.md round-3, `bench_continuous.py`); for ONLINE arrivals
    ContinuousBatcher wins instead (round-4 `bench_arrival_trace.py`).

    The sort key is the combined prompt_text+text character length — a
    host-cheap proxy for the tokenized length the 16x budget is actually
    derived from (Synthesizer._prepare tokenizes the CONCATENATION, so a
    long enrolled prompt inflates the budget exactly like long target
    text; sorting on text alone would misfile such requests into short
    groups and strand the group on their budget).
    """
    order = sorted(range(len(reqs)),
                   key=lambda i: len(reqs[i].prompt_text) + len(reqs[i].text),
                   reverse=True)
    return [order[lo: lo + group_size]
            for lo in range(0, len(order), group_size)]


def _prep_request(text_tokenizer, audio_tokenizer, r: "SynthesisRequest",
                  num_quantizers: int):
    """Shared per-request preprocessing for both schedulers (Synthesizer
    and ContinuousBatcher pad differently, but the load-bearing rules
    must stay identical): tokenize prompt_text+text TOGETHER (the 16x
    decode budget and the prefix-mode text trim are derived from the
    combined sequence, reference bin/infer.py:225-231); enroll length is
    len(prompt phonemes)+2, with a bare 2 when there is no prompt text —
    2 is the identity under trim_enrolled_text (prefix modes 2/4 subtract
    enroll-2 phonemes; 0 would SHIFT the text and grow text_lens by two
    padding positions); prompt codes come from precomputed codes, a wav
    via the codec, or empty. Returns (tokens, enroll_len, prompt_codes)."""
    from .data.tokenizer import tokenize_audio, tokenize_text

    toks = tokenize_text(text_tokenizer, f"{r.prompt_text} {r.text}".strip())
    enroll = (len(tokenize_text(text_tokenizer, r.prompt_text)) + 2
              if r.prompt_text else 2)
    if r.prompt_codes is not None:
        pc = np.asarray(r.prompt_codes, np.int32)
    elif r.prompt_wav:
        pc = tokenize_audio(audio_tokenizer, r.prompt_wav)[0]
    else:
        pc = np.zeros((0, num_quantizers), np.int32)
    return toks, enroll, pc


class Synthesizer:
    """End-to-end batched synthesis: text+prompt -> wav.

    Usage:
        synth = Synthesizer.from_checkpoint("exp/valle/best-valid-loss",
                                            text_tokens="...k2symbols")
        results = synth.synthesize([SynthesisRequest(...), ...])
    """

    def __init__(self, model, params, text_tokenizer, text_collater,
                 audio_tokenizer, *, model_state=None, top_k: int = -100,
                 temperature: float = 1.0, max_gen_len: int = 1024,
                 compute_dtype=None, seed: int = 0,
                 decode_mode: str = "exact", mesh=None,
                 codec_dtype: Optional[str] = None,
                 nar_score_bf16: str = "auto",
                 nar_attn_impl: str = "auto",
                 wav_transfer: str = "pcm16"):
        import jax
        import jax.numpy as jnp

        self.model = model
        # mesh: a ('data','model') jax.sharding.Mesh scales one serving
        # process over all local chips — requests shard over 'data', params
        # carry the TP rules ('model' axis; replicated at tp=1). Pallas
        # custom calls are opaque to GSPMD, so kernel decode modes cannot
        # ride jit auto-partitioning — but on a DP-only mesh (tp=1, params
        # replicated) they run under shard_map instead: every device
        # executes the full kernel program on its batch shard
        # (_mesh_kernel_inference below). TP meshes keep the exact/unroll
        # restriction (a sharded weight matrix cannot feed a single-device
        # kernel).
        self.mesh = mesh
        self._mesh_fn_cache = {}
        kernel_modes = ("int8", "fused", "fused_int8", "fused_w8", "bf16",
                        "fused_kv", "lanes", "fused_lanes", "mega", "auto")
        self._mesh_shard_kernels = False
        if mesh is not None:
            if decode_mode in kernel_modes:
                if mesh.shape.get("model", 1) != 1:
                    raise ValueError(
                        f"decode_mode='{decode_mode}' needs whole weight "
                        "matrices on each device (Pallas kernels stream "
                        "full weights); with tensor parallelism use "
                        "'exact' or 'unroll'. DP-only is the designed "
                        "ceiling for the kernel modes at this model size "
                        "— see BASELINE.md 'Round-5: tensor parallelism "
                        "for kernel decode' for the roofline argument")
                self._mesh_shard_kernels = True
            from .parallel.mesh import param_shardings

            params = jax.device_put(params, param_shardings(params, mesh))
        self.params = params
        # prenet BatchNorm running stats for add_prenet checkpoints
        self.model_state = model_state
        self.text_tokenizer = text_tokenizer
        self.text_collater = text_collater
        self.audio_tokenizer = audio_tokenizer
        self.top_k = top_k
        self.temperature = temperature
        self.max_gen_len = max_gen_len
        self.compute_dtype = compute_dtype or jnp.bfloat16
        # "exact" | "unroll" (token-exact) | "fused" (token-exact, Pallas
        # dense path) | "fused_w8" (int8-quantized streamed weights) |
        # "int8" | "fused_int8" (fastest at long caches; int8 KV cache,
        # needs batch % 8 == 0) | "bf16"/"fused_kv"/"lanes"/"fused_lanes"
        # /"mega" (token-exact Pallas attention-kernel modes, batch % 8
        # == 0; see models.inference.valle_inference) | "auto"
        # (fused_w8 at B <= 4 / fused / int8 by request shape —
        # see models.inference.resolve_auto_decode_mode)
        self.decode_mode = decode_mode
        # EnCodec decoder precision. Serving defaults to bfloat16 to match
        # compute_dtype (+31% codec decode, 41 dB SNR vs fp32 — far below
        # the codec's own quantization noise; BASELINE.md). Pass "float32"
        # to force the exact path.
        self.codec_dtype = codec_dtype or "bfloat16"
        # NAR-pass attention-score dtype: the (B, H, S, S) score matrix is
        # the NAR forward's HBM bottleneck; "auto" stores it bf16 whenever
        # compute is bf16 (measured A/B + trained-weights code agreement
        # in BASELINE.md round 3). "on"/"off" force it; inert at fp32.
        self.nar_score_bf16 = resolve_nar_score_bf16(
            nar_score_bf16, self.compute_dtype)
        # NAR-pass attention implementation; "auto" resolves per batch
        # at synthesis time (flash at B <= 8 — resolve_nar_attn_impl)
        self.nar_attn_impl = nar_attn_impl
        # waveform device->host representation: int16 PCM halves the
        # dominant transfer cost of batched codec decode and matches the
        # wav container's own precision (AudioTokenizer.decode). Pass
        # "float32" for bit-exact f32 waveforms.
        self.wav_transfer = wav_transfer
        self._rng = jax.random.PRNGKey(seed)

    @classmethod
    def from_checkpoint(cls, checkpoint: str, text_tokens: str,
                        text_backend: str = "espeak",
                        encodec_weights: Optional[str] = None, **kw):
        from .bin.infer import load_model
        from .data import AudioTokenizer, TextTokenizer
        from .data.collation import get_text_token_collater

        model, params, state, ckpt_tokens = load_model(checkpoint)
        return cls(
            model, params,
            TextTokenizer(backend=text_backend),
            get_text_token_collater(text_tokens or ckpt_tokens),
            AudioTokenizer(weights_path=encodec_weights),
            model_state=state, **kw)

    # -- preprocessing ------------------------------------------------------
    def _prepare(self, reqs: Sequence[SynthesisRequest]):
        token_seqs, enroll_lens, prompt_codes = [], [], []
        for r in reqs:
            toks, enroll, pc = _prep_request(
                self.text_tokenizer, self.audio_tokenizer, r,
                self.model.cfg.num_quantizers)
            token_seqs.append(toks)
            enroll_lens.append(enroll)
            prompt_codes.append(pc)

        max_tok = max(len(t) for t in token_seqs) + 2
        pad_text = _round_up(max_tok, 16)
        text_ids, text_lens = self.text_collater.index(token_seqs,
                                                       pad_to=pad_text)
        P = _round_up(max(max(c.shape[0] for c in prompt_codes), 1), 32)
        Q = self.model.cfg.num_quantizers
        prompts = np.zeros((len(reqs), P, Q), np.int32)
        p_lens = np.zeros((len(reqs),), np.int32)
        for i, c in enumerate(prompt_codes):
            prompts[i, : c.shape[0]] = c
            p_lens[i] = c.shape[0]
        return (text_ids, text_lens, prompts, p_lens,
                np.asarray(enroll_lens, np.int32))

    # -- main entry ----------------------------------------------------------
    def synthesize(self, reqs: Sequence[SynthesisRequest],
                   max_gen_len: Optional[int] = None
                   ) -> List[SynthesisResult]:
        import jax
        import jax.numpy as jnp

        from .models import valle_inference

        if not reqs:
            return []
        text_ids, text_lens, prompts, p_lens, enroll_lens = self._prepare(
            reqs)
        gen_budget = max_gen_len or min(
            self.max_gen_len, _round_up(int(text_lens.max()) * 16 + 2, 64))

        batch = [text_ids, text_lens, prompts, p_lens, enroll_lens]
        # snap the batch size to a grid (1,2,4,8,16,24,...) like every
        # other axis: raw len(reqs) would compile a fresh decode program
        # per distinct concurrent-request count. Pad rows repeat request
        # 0 and are trimmed from the results below; multiples of 8 keep
        # the int8 kernel modes eligible.
        B = len(reqs)
        Bp = 1 << (B - 1).bit_length() if B < 8 else _round_up(B, 8)
        if Bp != B:
            batch = [np.concatenate(
                [a, np.repeat(a[:1], Bp - B, axis=0)]) for a in batch]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape["data"]
            B = batch[0].shape[0]        # grid-padded row count
            Bp = -(-B // dp) * dp
            if Bp != B:  # pad to the data axis by repeating request 0
                batch = [np.concatenate(
                    [a, np.repeat(a[:1], Bp - B, axis=0)]) for a in batch]
            batch = [jax.device_put(a, NamedSharding(
                self.mesh, P("data", *(None,) * (a.ndim - 1))))
                for a in batch]
        text_ids, text_lens, prompts, p_lens, enroll_lens = batch

        self._rng, step_rng = jax.random.split(self._rng)
        if self._mesh_shard_kernels:
            codes, gen_lens = self._mesh_kernel_inference(
                (jnp.asarray(text_ids), jnp.asarray(text_lens),
                 jnp.asarray(prompts), jnp.asarray(p_lens),
                 jnp.asarray(enroll_lens)), gen_budget, step_rng)
        else:
            codes, gen_lens = valle_inference(
                self.params, self.model.cfg,
                jnp.asarray(text_ids), jnp.asarray(text_lens),
                jnp.asarray(prompts), jnp.asarray(p_lens),
                enroll_x_lens=jnp.asarray(enroll_lens),
                top_k=self.top_k, temperature=self.temperature,
                rng=step_rng, max_gen_len=gen_budget,
                compute_dtype=self.compute_dtype,
                decode_mode=self.decode_mode, state=self.model_state,
                nar_score_bf16=self.nar_score_bf16,
                nar_attn_impl=resolve_nar_attn_impl(
                    self.nar_attn_impl, text_ids.shape[0],
                    self.model.cfg.model_name))
        # decode the PADDED batch on-device (same static shape as the
        # decode program), then trim the padding rows per request
        wavs = self.audio_tokenizer.decode(np.asarray(codes),
                                           dtype=self.codec_dtype,
                                           transfer=self.wav_transfer)
        wavs = wavs[: len(reqs)]
        codes = np.asarray(codes)[: len(reqs)]   # drop padding rows
        gen_lens = np.asarray(gen_lens)[: len(reqs)]
        out = []
        for i in range(len(reqs)):
            n = int(gen_lens[i])
            out.append(SynthesisResult(
                wav=wavs[i, : n * 320], codes=codes[i, :n], frames=n))
        return out

    def _mesh_kernel_inference(self, batch, gen_budget, rng):
        """Kernel decode modes on a DP mesh via shard_map.

        GSPMD cannot partition a Pallas custom call, so jit
        auto-partitioning (the exact/unroll mesh path) is out for the
        fused/int8 kernels. On a tp=1 mesh the params are whole on every
        device, so each device instead runs the COMPLETE decode program
        on its B/dp batch rows under `shard_map` — same recipe as the
        reference's per-GPU DDP serving but over ICI, with zero
        cross-device traffic during decode. The sampling rng forks per
        shard (fold_in on the 'data' axis index), so sampled outputs
        differ from the single-device draw order; greedy/top-1 tokens
        are exactly the single-device tokens
        (tests/test_serving.py::test_synthesize_dp_mesh_kernel_modes).
        """
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from .models import valle_inference
        from .models.inference import resolve_auto_decode_mode

        mesh = self.mesh
        dp = mesh.shape["data"]
        B, S = batch[0].shape
        Bs = B // dp                     # per-shard batch rows
        mode = self.decode_mode
        if mode == "auto":
            # resolve with the PER-SHARD batch: that is the shape each
            # device's kernel actually sees
            mode = resolve_auto_decode_mode(
                B=Bs, S=S, P=batch[2].shape[1], max_gen_len=gen_budget)
        if mode in ("int8", "fused_int8", "bf16", "fused_kv", "lanes",
                    "fused_lanes", "mega") and Bs % 8 != 0:
            mode = "fused"               # per-shard grouped-mode rule
        # NAR impl resolves on the PER-SHARD batch each chip decodes
        nai = resolve_nar_attn_impl(self.nar_attn_impl, Bs,
                                    self.model.cfg.model_name)
        key = (B, S, batch[2].shape[1], int(batch[4].shape[0]),
               gen_budget, mode, nai)
        fn = self._mesh_fn_cache.get(key)
        if fn is None:
            cfg = self.model.cfg
            top_k, temp = self.top_k, self.temperature
            cd, nsb = self.compute_dtype, self.nar_score_bf16

            def body(params, mstate, text, tl, pr, pl, el, r):
                r = jax.random.fold_in(r, jax.lax.axis_index("data"))
                return valle_inference(
                    params, cfg, text, tl, pr, pl, enroll_x_lens=el,
                    top_k=top_k, temperature=temp, rng=r,
                    max_gen_len=gen_budget, compute_dtype=cd,
                    decode_mode=mode, state=mstate, nar_score_bf16=nsb,
                    nar_attn_impl=nai)

            pspec = jax.tree_util.tree_map(lambda _: P(), self.params)
            sspec = jax.tree_util.tree_map(lambda _: P(), self.model_state)
            d = P("data")
            fn = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(pspec, sspec, d, d, d, d, d, P()),
                out_specs=(d, d), check_vma=False))
            self._mesh_fn_cache[key] = fn
        return fn(self.params, self.model_state, *batch, rng)


class ContinuousBatcher:
    """Continuous-batching TTS server loop (slot recycling).

    `Synthesizer.synthesize` holds every request in a batch until the
    LONGEST generation finishes; with realistic utterance-length variance
    the average lane idles a large fraction of its steps. This scheduler
    keeps a fixed table of decode slots and, whenever a lane emits EOS,
    installs the next queued request into that slot mid-flight — no
    recompilation (all shapes static: one prefill, one install, one
    chunk program for the server's lifetime; see models/cb_decode.py).

    Finished AR sequences are refined in NAR groups of ``slots`` and
    decoded to wav through the standard EnCodec path, so results are
    bit-identical to `Synthesizer` under greedy decoding (tested).

    Usage:
        cb = ContinuousBatcher(model, params, tok, collater, audio_tok,
                               slots=8, text_pad=64, max_gen_len=512)
        results = cb.run([SynthesisRequest(...), ...])
    """

    def __init__(self, model, params, text_tokenizer, text_collater,
                 audio_tokenizer, *, slots: int = 8, text_pad: int = 64,
                 prompt_pad: int = 256, max_gen_len: int = 512,
                 chunk: int = 64, top_k: int = -100,
                 temperature: float = 1.0, compute_dtype=None,
                 seed: int = 0, model_state=None,
                 codec_dtype: Optional[str] = None,
                 unroll_layers: bool = False,
                 admission: str = "lpt",
                 nar_score_bf16: str = "auto",
                 nar_attn_impl: str = "auto",
                 wav_transfer: str = "pcm16", mesh=None):
        import jax
        import jax.numpy as jnp

        cfg = model.cfg
        assert cfg.model_name == "valle", "continuous batching targets VALLE"
        self.model = model
        # mesh: a ('data','model') DP mesh shards the SLOT TABLE over
        # 'data' — slots/dp decode lanes per chip, params replicated, one
        # dispatch per chunk for the whole fleet. Unlike the kernel decode
        # modes (Pallas custom calls are opaque to GSPMD and need the
        # shard_map recipe, Synthesizer._mesh_kernel_inference), the
        # continuous-batching programs are pure XLA (cb_decode.py's module
        # docstring: kernel modes are out of scope BY MEASUREMENT), so jit
        # auto-partitioning shards them directly: the chunk loop's per-slot
        # math partitions with zero cross-chip traffic except the scalar
        # all-done reduction, and — jax_threefry_partitionable — the rng
        # draws are bit-identical to the single-device program, so tokens
        # (sampled AND greedy) match mesh=None exactly
        # (tests/test_continuous_batching.py::test_cb_dp_mesh_*). The host
        # scheduler stays global: one queue feeding all chips; a freed
        # slot's refill lands on whichever chip owns that slot row.
        self.mesh = mesh
        if mesh is not None:
            if mesh.shape.get("model", 1) != 1:
                raise ValueError(
                    "continuous batching is DP-only: per-slot KV caches "
                    "shard over 'data'; use a (dp, 1) mesh")
            dp = mesh.shape["data"]
            if slots % dp != 0:
                raise ValueError(
                    f"slots ({slots}) must be divisible by the mesh "
                    f"data axis ({dp}): the slot table shards evenly")
            from .parallel.mesh import param_shardings

            params = jax.device_put(params, param_shardings(params, mesh))
            if model_state is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                model_state = jax.device_put(
                    model_state, jax.tree_util.tree_map(
                        lambda _: NamedSharding(mesh, P()), model_state))
        self.params = params
        self.model_state = model_state
        self.text_tokenizer = text_tokenizer
        self.text_collater = text_collater
        self.audio_tokenizer = audio_tokenizer
        self.slots = slots
        self.text_pad = text_pad
        self.prompt_pad = prompt_pad
        self.max_gen_len = max_gen_len
        self.chunk = chunk
        self.top_k = top_k
        self.temperature = temperature
        self.compute_dtype = compute_dtype or jnp.bfloat16
        self.codec_dtype = codec_dtype or "bfloat16"
        self.nar_score_bf16 = resolve_nar_score_bf16(
            nar_score_bf16, self.compute_dtype)
        # NAR groups run at width `slots`; resolve the impl once here
        self.nar_attn_impl = resolve_nar_attn_impl(
            nar_attn_impl, slots, cfg.model_name)
        self.wav_transfer = wav_transfer
        self.unroll_layers = unroll_layers
        if admission not in ("lpt", "fifo"):
            raise ValueError(f"admission must be 'lpt'|'fifo': {admission}")
        # "lpt" admits longest text (largest decode budget) first, which
        # shortens the drain tail; the step cost is dominated by reading
        # every slot's KV cache, so total chunk count ~ wall time.
        # Results always return in submission order either way.
        self.admission = admission
        bos = int(cfg.prepend_bos)
        self.cache_len = text_pad + bos + prompt_pad + max_gen_len + 1
        self._rng = jax.random.PRNGKey(seed)

    # -- mesh sharding helpers ----------------------------------------------
    def _shard_state(self, st):
        """Lay the slot table out over the mesh: k/v shard slot axis 1,
        per-slot vectors shard axis 0, the rng key replicates."""
        if self.mesh is None:
            return st
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def spec(name):
            if name in ("k", "v"):
                return P(None, "data")
            if name == "rng":
                return P()
            return P("data")

        return {k: jax.device_put(v, NamedSharding(self.mesh, spec(k)))
                for k, v in st.items()}

    def _shard_rows(self, a):
        """Shard a wave/group array over its request-row axis 0."""
        if self.mesh is None:
            return a
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return jax.device_put(a, NamedSharding(
            self.mesh, P("data", *(None,) * (a.ndim - 1))))

    # -- per-request preprocessing (fixed shapes) ---------------------------
    def _prep_one(self, r: SynthesisRequest):
        toks, enroll, pc = _prep_request(
            self.text_tokenizer, self.audio_tokenizer, r,
            self.model.cfg.num_quantizers)
        if len(toks) + 2 > self.text_pad:
            raise ValueError(
                f"text ({len(toks)} tokens) exceeds text_pad="
                f"{self.text_pad}; raise text_pad")
        text_ids, text_lens = self.text_collater.index(
            [toks], pad_to=self.text_pad)
        # NOTE: unlike Synthesizer._prepare (which grows P to the batch
        # max), the slot table's prompt axis is fixed — long prompts are
        # truncated to prompt_pad
        pc = pc[: self.prompt_pad]
        prompts = np.zeros((1, self.prompt_pad, pc.shape[1]), np.int32)
        prompts[0, : pc.shape[0]] = pc
        return {
            "text": np.asarray(text_ids, np.int32),
            "text_len": int(text_lens[0]),
            "prompts": prompts,
            "p_len": pc.shape[0],
            "enroll_len": enroll,
        }

    # -- main entry ---------------------------------------------------------
    def run(self, reqs: Sequence[SynthesisRequest],
            progress: bool = False) -> List[SynthesisResult]:
        """Serve all requests through the slot table; returns results in
        submission order."""
        import jax
        import jax.numpy as jnp

        from .models.cb_decode import (
            cb_decode_chunk,
            cb_install_many,
            cb_prefill,
            cb_state_init,
        )

        if not reqs:
            return []
        cfg = self.model.cfg
        bos = int(cfg.prepend_bos)
        queue = [(i, self._prep_one(r)) for i, r in enumerate(reqs)]
        if self.admission == "lpt":
            # longest text (largest decode budget, 16x rule) first; FIFO
            # within equal lengths
            queue.sort(key=lambda e: (-e[1]["text_len"], e[0]))
        queue.reverse()                      # pop() serves in plan order
        self._rng, rng0 = jax.random.split(self._rng)
        st = cb_state_init(cfg, slots=self.slots, cache_len=self.cache_len,
                           max_gen_len=self.max_gen_len, rng=rng0,
                           compute_dtype=self.compute_dtype)
        st = self._shard_state(st)
        occupant = [None] * self.slots       # queue entry per slot
        finished = {}                        # req idx -> (q0 (G,), n)
        stats = {"chunks": 0, "waves": 0, "install_s": 0.0}

        def refill(st, free_slots):
            """Install up to len(free_slots) queued requests in ONE
            prefill + ONE install dispatch. The wave is padded to the
            fixed width ``slots`` by repeating entry 0 (index AND
            values — cb_install_many's duplicate-scatter contract), so
            one compiled program serves every wave size."""
            take = min(len(free_slots), len(queue))
            if take == 0:
                return st
            t0 = time.perf_counter()
            stats["waves"] += 1
            wave = [(free_slots[j], queue.pop()) for j in range(take)]
            for slot, entry in wave:
                occupant[slot] = entry
            wave = wave + [wave[0]] * (self.slots - take)
            recs = [entry[1] for _, entry in wave]
            slot_ids = jnp.asarray([s for s, _ in wave], jnp.int32)
            text = self._shard_rows(
                jnp.asarray(np.concatenate([r["text"] for r in recs])))
            text_lens = self._shard_rows(
                jnp.asarray([r["text_len"] for r in recs], jnp.int32))
            q0 = self._shard_rows(jnp.asarray(
                np.concatenate([r["prompts"][..., 0] for r in recs])))
            p_lens = self._shard_rows(
                jnp.asarray([r["p_len"] for r in recs], jnp.int32))
            kb, vb, lg0 = cb_prefill(
                self.params, cfg, text, text_lens, q0, p_lens,
                cache_len=self.cache_len, compute_dtype=self.compute_dtype,
                state=self.model_state)
            st = cb_install_many(st, slot_ids, kb, vb, lg0, text_lens,
                                 p_lens + bos)
            stats["install_s"] += time.perf_counter() - t0
            return st

        st = refill(st, list(range(self.slots)))
        while any(o is not None for o in occupant):
            stats["chunks"] += 1
            st = cb_decode_chunk(
                self.params, st, self.temperature, cfg=cfg,
                S=self.text_pad, K=self.chunk, top_k=self.top_k,
                compute_dtype=self.compute_dtype,
                unroll_layers=self.unroll_layers)
            done = np.asarray(st["done"])
            freed = [s for s in range(self.slots)
                     if occupant[s] is not None and done[s]]
            if not freed:
                continue
            gen_codes = np.asarray(st["gen_codes"])
            gen_lens = np.asarray(st["gen_lens"])
            for slot in freed:
                idx, rec = occupant[slot]
                finished[idx] = (gen_codes[slot].copy(),
                                 int(gen_lens[slot]), rec)
                occupant[slot] = None
            st = refill(st, freed)
            if progress:
                logging.info("continuous: %d/%d finished, %d queued",
                             len(finished), len(reqs), len(queue))
        # wall-time attribution for benchmarks (stamped before the NAR
        # finalize, which has its own dispatch profile)
        self.last_stats = dict(stats)
        return self._finalize(finished)

    # -- NAR + codec finishing ---------------------------------------------
    def _finalize(self, finished) -> List[SynthesisResult]:
        import jax.numpy as jnp

        from .models.inference import trim_enrolled_text, valle_nar_decode

        cfg = self.model.cfg
        recs = {i: finished[i][2] for i in finished}
        order = sorted(finished)
        results = {}
        group = self.slots
        for lo in range(0, len(order), group):
            idxs = order[lo: lo + group]
            pad = group - len(idxs)
            rows = idxs + [idxs[0]] * pad
            text = np.concatenate([recs[i]["text"] for i in rows])
            text_lens = np.asarray([recs[i]["text_len"] for i in rows],
                                   np.int32)
            prompts = np.concatenate([recs[i]["prompts"] for i in rows])
            p_lens = np.asarray([recs[i]["p_len"] for i in rows], np.int32)
            enr = np.asarray([recs[i]["enroll_len"] for i in rows], np.int32)
            q0 = np.stack([finished[i][0] for i in rows])
            g_lens = np.asarray([finished[i][1] for i in rows], np.int32)

            if cfg.num_quantizers == 1:
                codes = np.asarray(q0)[..., None]
                wavs = self.audio_tokenizer.decode(
                    codes, dtype=self.codec_dtype,
                    transfer=self.wav_transfer)
                for j, i in enumerate(idxs):
                    n = finished[i][1]
                    results[i] = SynthesisResult(
                        wav=wavs[j, : n * 320], codes=codes[j, :n],
                        frames=n)
                continue
            ntext, nlens = jnp.asarray(text), jnp.asarray(text_lens)
            if cfg.prefix_mode in (2, 4):
                ntext, nlens = trim_enrolled_text(
                    ntext, nlens, jnp.asarray(enr))
            codes = valle_nar_decode(
                self.params, cfg, self._shard_rows(ntext),
                self._shard_rows(nlens),
                self._shard_rows(jnp.asarray(prompts)),
                self._shard_rows(jnp.asarray(p_lens)),
                self._shard_rows(jnp.asarray(q0)),
                self._shard_rows(jnp.asarray(g_lens)),
                compute_dtype=self.compute_dtype, state=self.model_state,
                score_bf16=self.nar_score_bf16,
                attn_impl=self.nar_attn_impl)
            wavs = self.audio_tokenizer.decode(np.asarray(codes),
                                               dtype=self.codec_dtype,
                                               transfer=self.wav_transfer)
            codes = np.asarray(codes)
            for j, i in enumerate(idxs):
                n = finished[i][1]
                results[i] = SynthesisResult(
                    wav=wavs[j, : n * 320], codes=codes[j, :n], frames=n)
        return [results[i] for i in sorted(results)]
