#!/usr/bin/env python3
"""HTTP zero-shot TTS server: batched (and continuous-batched) serving.

The reference has no serving path at all — its inference is a batch-1
CLI (``/root/reference/valle/models/valle.py:989`` asserts B == 1). This
CLI exposes the batched `Synthesizer` / slot-recycling `ContinuousBatcher`
over plain HTTP (stdlib only, no extra dependencies):

    python3 -m valle_tpu.bin.serve \\
        --checkpoint exp/valle/best-valid-loss \\
        --text-tokens data/tokenized/unique_text_tokens.k2symbols \\
        --port 8080 --mode continuous --slots 8

    POST /synthesize  {"text": "...", "prompt_text": "...",
                       "prompt_wav": "/path/on/server.wav"}
                      -> audio/wav bytes (24 kHz mono PCM16)
       (add "codes_only": true for a JSON {codes, frames} response)
    GET  /healthz     -> {"status": "ok", ...}

Concurrent requests are coalesced by a single worker: it drains the
queue every --batch-window-ms and runs one batched synthesis, so the
model amortizes across simultaneous callers; --mode continuous serves
the drained group through the slot recycler (throughput tracks the mean
generation length instead of the batch max — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import logging
import queue
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ServeError(str):
    """An error message that also carries its HTTP status code.

    str subclass so existing callers of ``ServingWorker.submit`` keep
    working (``"..." in err``, json-serializable) while the HTTP layer
    can map overload/deadline/engine failures to distinct codes.
    """

    code = 500

    def __new__(cls, msg: str, code: int = 500):
        s = super().__new__(cls, msg)
        s.code = code
        return s


def wav_bytes(audio: np.ndarray, sample_rate: int = 24000) -> bytes:
    """Minimal RIFF/PCM16 container for an HTTP response body."""
    # round (not truncate) so pcm16-transferred samples k/32767 map back to
    # exactly k — same convention as the device quantizer and the native
    # wav writer (audioio.cpp lrintf)
    pcm = np.round(np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


class ServingWorker(threading.Thread):
    """Coalesces queued requests into batches and runs the engine.

    With ``group_size`` set, each drained batch is planned through
    `serving.plan_groups` (sort by prompt+text length — the AR cap is
    16x the tokenized prompt+text — longest first, split into
    group_size engine calls): each
    group's decode budget then tracks its own longest request instead of
    the whole drain's, which is the measured throughput winner for
    OFFLINE/batch jobs — all requests present up front (BASELINE.md
    round-3, `bench_continuous.py`). For ONLINE arrivals the measured
    winner is continuous mode (round-4 `bench_arrival_trace.py`: p50
    1.45-2.97x, p95 up to 9.4x better at 50-80% load — static's small
    mixed-length drains strand the serial AR decode). Leave group_size
    None for engines that schedule internally (continuous mode).
    """

    def __init__(self, synth_fn, *, batch_window_ms: float = 50.0,
                 max_batch: int = 32, group_size=None,
                 max_queue: int = 0, request_timeout_s: float = 0.0):
        super().__init__(daemon=True)
        self.synth_fn = synth_fn
        self.batch_window = batch_window_ms / 1e3
        self.max_batch = max_batch
        self.group_size = group_size
        # bounded admission: a dead/slow engine must turn into fast 503s,
        # not an unbounded queue of clients all destined to time out
        self.inbox = queue.Queue(maxsize=max_queue)
        self.request_timeout = request_timeout_s
        self._stop = threading.Event()

    def submit(self, req):
        """Blocking submit: returns (result, error).

        error is None on success, else a `ServeError` whose ``.code`` is
        503 (queue full), 504 (deadline exceeded) or 500 (engine).
        """
        ev = threading.Event()
        deadline = (time.monotonic() + self.request_timeout
                    if self.request_timeout else None)
        holder = {"deadline": deadline}
        try:
            self.inbox.put_nowait((req, ev, holder))
        except queue.Full:
            return None, ServeError(
                "server overloaded: request queue is full", 503)
        if not ev.wait(timeout=self.request_timeout or None):
            # the worker may still synthesize this request (it could be
            # mid-batch); flag it so a still-queued entry is dropped
            # instead of occupying a decode slot for a gone client
            holder["abandoned"] = True
            return None, ServeError(
                f"deadline exceeded ({self.request_timeout:.0f}s)", 504)
        return holder.get("result"), holder.get("error")

    def stop(self):
        self._stop.set()
        try:
            self.inbox.put_nowait(None)   # wake the worker
        except queue.Full:
            pass                          # it's busy draining; _stop set

    def run(self):
        while not self._stop.is_set():
            item = self.inbox.get()
            if item is None:
                continue
            batch = [item]
            # coalesce: wait one window, then drain up to max_batch
            deadline = self.batch_window
            while len(batch) < self.max_batch:
                try:
                    nxt = self.inbox.get(timeout=deadline)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
                deadline = 0.005      # drain whatever else is in flight
            # drop requests whose client already gave up (504'd) — a
            # slot spent on a gone caller starves the live ones
            live = []
            now = time.monotonic()
            for item in batch:
                _, ev, holder = item
                dl = holder.get("deadline")
                if holder.get("abandoned") or (dl is not None and now > dl):
                    holder["error"] = ServeError("deadline exceeded", 504)
                    ev.set()
                else:
                    live.append(item)
            batch = live
            if not batch:
                continue
            self._run_and_deliver(batch)

    def _run_and_deliver(self, batch):
        """Run the drained batch; RELEASE each plan_groups group's
        clients as that group finishes (the tail group's wall must not
        inflate the head groups' latency), and fail per-group rather
        than per-drain."""

        def deliver(items, results, err):
            for (req, ev, holder), res in zip(items, results):
                holder["result"], holder["error"] = res, err
                ev.set()

        def run_one(items):
            reqs = [b[0] for b in items]
            try:
                results = self.synth_fn(reqs)
                if len(results) != len(reqs):    # never hang a client
                    raise RuntimeError(
                        f"engine returned {len(results)} results for "
                        f"{len(reqs)} requests")
                deliver(items, results, None)
            except Exception as e:
                logging.exception("synthesis failed")
                deliver(items, [None] * len(items), ServeError(str(e)))

        if self.group_size is None:
            run_one(batch)
            return
        # route even drains that fit one group through plan_groups so
        # engine calls are uniformly longest-first regardless of drain
        # timing (a single group is just sorted)
        from ..serving import plan_groups

        for group in plan_groups([b[0] for b in batch], self.group_size):
            run_one([batch[i] for i in group])


def make_handler(worker: ServingWorker, info: dict,
                 max_text_len: int = 2048, max_prompt_frames: int = 2048):
    from ..serving import SynthesisRequest

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # route through logging
            logging.info("%s " + fmt, self.client_address[0], *args)

        def _reply(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/"):
                self._reply(200, json.dumps(
                    {"status": "ok", **info}).encode(), "application/json")
            else:
                self._reply(404, b"{}", "application/json")

        def do_POST(self):
            if self.path != "/synthesize":
                self._reply(404, b"{}", "application/json")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                text = body["text"]
                if not isinstance(text, str):
                    raise TypeError("'text' must be a string")
                # `"prompt_text": null` must degrade to "" (a None would
                # TypeError inside plan_groups' sort key and fail the
                # WHOLE coalesced batch, not just this request)
                req = SynthesisRequest(
                    text=text,
                    prompt_text=body.get("prompt_text") or "",
                    prompt_wav=body.get("prompt_wav"),
                    prompt_codes=(np.asarray(body["prompt_codes"], np.int32)
                                  if body.get("prompt_codes") is not None
                                  else None))
            except Exception as e:
                self._reply(400, json.dumps(
                    {"error": f"bad request: {e}"}).encode(),
                    "application/json")
                return
            # admission guards: oversized inputs are rejected up front —
            # the AR budget is 16x the tokenized prompt+text, so an
            # unbounded text is an unbounded decode slot occupation
            n_chars = len(req.text) + len(req.prompt_text or "")
            n_pframes = (0 if req.prompt_codes is None
                         else int(req.prompt_codes.shape[0]))
            if n_chars > max_text_len or n_pframes > max_prompt_frames:
                self._reply(413, json.dumps(
                    {"error": f"request too large: {n_chars} chars "
                              f"(max {max_text_len}), {n_pframes} prompt "
                              f"frames (max {max_prompt_frames})"}).encode(),
                    "application/json")
                return
            result, err = worker.submit(req)
            if err is not None or result is None:
                code = getattr(err, "code", 500)
                body = json.dumps({"error": str(err or "internal")}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                if code == 503:
                    self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            if body.get("codes_only"):
                self._reply(200, json.dumps(
                    {"frames": result.frames,
                     "codes": result.codes.tolist()}).encode(),
                    "application/json")
            else:
                self._reply(200, wav_bytes(np.asarray(result.wav)),
                            "audio/wav")

    return Handler


def make_server(synth_fn, *, host="127.0.0.1", port=0,
                batch_window_ms=50.0, max_batch=32, group_size=None,
                info=None, max_queue=0, request_timeout_s=0.0,
                max_text_len=2048, max_prompt_frames=2048):
    """Build (server, worker); worker is started, server is not yet
    serving — call ``server.serve_forever()`` (tests drive it from a
    thread)."""
    worker = ServingWorker(synth_fn, batch_window_ms=batch_window_ms,
                           max_batch=max_batch, group_size=group_size,
                           max_queue=max_queue,
                           request_timeout_s=request_timeout_s)
    worker.start()
    server = ThreadingHTTPServer(
        (host, port),
        make_handler(worker, info or {}, max_text_len=max_text_len,
                     max_prompt_frames=max_prompt_frames))
    return server, worker


def get_parser():
    parser = argparse.ArgumentParser(description="HTTP TTS server")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--text-tokens", type=str, default="")
    parser.add_argument("--text-backend", type=str, default="espeak")
    parser.add_argument("--encodec-weights", type=str, default=None)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--mode", type=str, default="static",
                        help="static (Synthesizer) | continuous "
                             "(ContinuousBatcher slot recycling)")
    parser.add_argument("--decode-mode", type=str, default="auto",
                        help="static mode only; see Synthesizer")
    parser.add_argument("--slots", type=int, default=8,
                        help="continuous mode: decode slot count")
    parser.add_argument("--text-pad", type=int, default=128,
                        help="continuous mode: static text width")
    parser.add_argument("--chunk", type=int, default=64,
                        help="continuous mode: decode steps per host sync")
    parser.add_argument("--batch-window-ms", type=float, default=50.0)
    parser.add_argument("--max-batch", type=int, default=32,
                        help="max requests drained per serving cycle")
    parser.add_argument("--max-queue", type=int, default=256,
                        help="admission cap: queued requests beyond this "
                             "get an immediate 503 + Retry-After instead "
                             "of waiting forever (0 = unbounded)")
    parser.add_argument("--request-timeout-s", type=float, default=120.0,
                        help="per-request deadline: 504 after this long "
                             "in queue+synthesis (0 = no deadline); "
                             "expired requests still queued are dropped "
                             "without occupying a decode slot")
    parser.add_argument("--max-text-len", type=int, default=2048,
                        help="admission cap on len(text)+len(prompt_text) "
                             "in characters (413 beyond; the AR decode "
                             "budget is 16x the tokenized length)")
    parser.add_argument("--max-prompt-frames", type=int, default=2048,
                        help="admission cap on prompt_codes frames "
                             "(413 beyond)")
    parser.add_argument("--group-size", type=int, default=0,
                        help="static mode: split each drained cycle into "
                             "length-sorted groups of this size (0 = one "
                             "engine call per cycle; see "
                             "serving.plan_groups)")
    parser.add_argument("--admission", type=str, default="lpt",
                        choices=["lpt", "fifo"],
                        help="continuous mode: queue admission order "
                             "(lpt = longest text first, the measured "
                             "throughput winner)")
    parser.add_argument("--dp", type=int, default=0,
                        help="shard serving over the first N local devices "
                        "(DP-only mesh). Static mode: each batch splits "
                        "B/N rows per chip (all decode modes — Pallas "
                        "kernel modes run under shard_map). Continuous "
                        "mode: the slot table shards slots/N per chip "
                        "(slots must divide evenly; tokens are exactly "
                        "the single-device tokens). 0 = one device.")
    parser.add_argument("--max-gen-len", type=int, default=1024)
    parser.add_argument("--top-k", type=int, default=-100)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--codec-dtype", type=str, default="bfloat16")
    parser.add_argument("--nar-score-bf16", type=str, default="auto",
                        choices=("auto", "on", "off"),
                        help="bf16 storage of the NAR passes' attention "
                        "scores (auto: on at bf16 compute; measured A/B + "
                        "trained-weights agreement gate, BASELINE.md)")
    parser.add_argument("--wav-transfer", type=str, default="pcm16",
                        choices=("pcm16", "float32"),
                        help="waveform device->host representation; pcm16 "
                        "halves the dominant transfer cost and matches the "
                        "16-bit wav container precision")
    return parser


def main():
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args()

    from ..bin.infer import load_model
    from ..data import AudioTokenizer, TextTokenizer
    from ..data.collation import get_text_token_collater
    from ..serving import ContinuousBatcher, Synthesizer

    model, params, state, ckpt_tokens = load_model(args.checkpoint)
    tok = TextTokenizer(backend=args.text_backend)
    collater = get_text_token_collater(args.text_tokens or ckpt_tokens)
    audio_tok = AudioTokenizer(weights_path=args.encodec_weights)
    common = dict(model_state=state, top_k=args.top_k,
                  temperature=args.temperature,
                  max_gen_len=args.max_gen_len,
                  codec_dtype=args.codec_dtype,
                  nar_score_bf16=args.nar_score_bf16,
                  wav_transfer=args.wav_transfer)
    mesh = None
    if args.dp:
        import jax

        from ..parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if args.dp > n_dev:
            raise SystemExit(
                f"--dp {args.dp} exceeds the {n_dev} available "
                f"device(s); pass --dp <= {n_dev}")
        mesh = make_mesh(dp=args.dp, tp=1,
                         devices=jax.devices()[: args.dp])
    if args.mode == "continuous":
        if args.dp and args.slots % args.dp:
            raise SystemExit(
                f"--slots {args.slots} must be divisible by --dp "
                f"{args.dp}: the slot table shards evenly over chips")
        engine = ContinuousBatcher(
            model, params, tok, collater, audio_tok, slots=args.slots,
            text_pad=args.text_pad, chunk=args.chunk,
            admission=args.admission, mesh=mesh, **common)
        synth_fn = engine.run
    else:
        engine = Synthesizer(model, params, tok, collater, audio_tok,
                             decode_mode=args.decode_mode, mesh=mesh,
                             **common)
        synth_fn = engine.synthesize

    server, worker = make_server(
        synth_fn, host=args.host, port=args.port,
        batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
        group_size=(args.group_size or None) if args.mode != "continuous"
        else None,
        info={"mode": args.mode, "model": model.cfg.model_name},
        max_queue=args.max_queue, request_timeout_s=args.request_timeout_s,
        max_text_len=args.max_text_len,
        max_prompt_frames=args.max_prompt_frames)
    logging.info("serving on %s:%d (%s mode)", args.host,
                 server.server_address[1], args.mode)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        worker.stop()
        server.server_close()


if __name__ == "__main__":
    main()
