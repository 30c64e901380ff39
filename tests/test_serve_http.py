"""HTTP serving CLI: request coalescing, wav/json responses, errors.

The reference has no server (batch-1 CLI); correctness here is defined
against the Synthesizer, which is parity-tested elsewhere.
"""

import io
import json
import threading
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.bin.serve import ServingWorker, make_server, wav_bytes
from valle_tpu.data import AudioTokenizer, TextTokenizer
from valle_tpu.data.collation import TextTokenCollater
from valle_tpu.models import ValleConfig, ValleModel
from valle_tpu.serving import Synthesizer


def test_wav_bytes_roundtrip():
    audio = np.sin(np.linspace(0, 100, 2400)).astype(np.float32) * 0.5
    blob = wav_bytes(audio, 24000)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 24000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 2400
        pcm = np.frombuffer(w.readframes(2400), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=2e-4)


def _tiny_synth():
    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    return Synthesizer(
        model, params, TextTokenizer(backend="char"),
        TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_ "))),
        AudioTokenizer(), top_k=5, max_gen_len=16,
        compute_dtype=jnp.float32)


def test_http_server_end_to_end():
    synth = _tiny_synth()
    calls = []

    def synth_fn(reqs):
        calls.append(len(reqs))
        return synth.synthesize(reqs, max_gen_len=16)

    server, worker = make_server(synth_fn, port=0, batch_window_ms=200,
                                 info={"mode": "static"})
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["status"] == "ok"

        # three concurrent requests coalesce into one engine call
        outs = {}

        def post(i, body):
            data = json.dumps(body).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=data,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                outs[i] = (r.status, r.headers.get("Content-Type"),
                           r.read())

        threads = [threading.Thread(target=post, args=(i, {
                       "text": txt,
                       "prompt_codes": np.random.RandomState(i).randint(
                           0, 1024, (5, 8)).tolist()}))
                   for i, txt in enumerate(
                       ("hello world", "second request", "third one"))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert sorted(outs) == [0, 1, 2]
        for status, ctype, blob in outs.values():
            assert status == 200 and ctype == "audio/wav"
            with wave.open(io.BytesIO(blob)) as w:
                assert w.getframerate() == 24000
                assert w.getnframes() > 0
        assert max(calls) > 1        # coalescing actually batched

        # codes_only JSON response
        data = json.dumps({"text": "hello", "codes_only": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body["frames"] == len(body["codes"])
        assert all(len(row) == 8 for row in body["codes"])

        # explicit null prompt_text must degrade to "" (a None would
        # TypeError inside plan_groups and 500 the whole drain)
        data = json.dumps({"text": "hello", "prompt_text": None,
                           "codes_only": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        # non-string text -> 400, not a worker crash
        bad_text = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": 7}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad_text)
        assert ei.value.code == 400

        # malformed request -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        worker.stop()
        server.server_close()


def test_plan_groups_sorts_longest_first():
    from valle_tpu.serving import SynthesisRequest, plan_groups

    reqs = [SynthesisRequest(text="x" * n) for n in (3, 30, 7, 18, 11)]
    groups = plan_groups(reqs, 2)
    assert [len(g) for g in groups] == [2, 2, 1]
    flat = [i for g in groups for i in g]
    assert sorted(flat) == list(range(5))
    lens = [len(reqs[i].text) for i in flat]
    assert lens == sorted(lens, reverse=True)   # 30,18,11,7,3


def test_worker_group_size_splits_and_reorders():
    from valle_tpu.serving import SynthesisRequest

    seen = []

    def synth_fn(reqs):
        seen.append([len(r.text) for r in reqs])
        return [f"res{len(r.text)}" for r in reqs]

    worker = ServingWorker(synth_fn, batch_window_ms=300, max_batch=8,
                           group_size=2)
    worker.start()
    try:
        outs = {}

        def post(n):
            outs[n] = worker.submit(SynthesisRequest(text="x" * n))

        threads = [threading.Thread(target=post, args=(n,))
                   for n in (3, 30, 7, 18, 11)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        # every caller got ITS result despite the sorted regrouping
        for n in (3, 30, 7, 18, 11):
            assert outs[n] == (f"res{n}", None)
        # groups are size <= 2 and internally longest-first (drain
        # boundaries depend on thread timing, so only per-group order
        # is deterministic)
        flat = [n for g in seen for n in g]
        assert sorted(flat) == [3, 7, 11, 18, 30]
        assert max(len(g) for g in seen) <= 2
        assert all(g == sorted(g, reverse=True) for g in seen)
    finally:
        worker.stop()


def test_bounded_queue_sheds_load_and_recovers():
    """Admission control under a client burst: with a slow engine and a
    tiny queue, excess clients get an immediate 503 (+Retry-After), the
    admitted ones complete, and the server serves normally afterwards."""
    import time

    from valle_tpu.serving import SynthesisRequest

    def slow_synth(reqs):
        time.sleep(0.25)
        return [f"ok:{r.text}" for r in reqs]

    worker = ServingWorker(slow_synth, batch_window_ms=50, max_batch=1,
                           max_queue=2)
    worker.start()
    try:
        results = {}

        def post(i):
            results[i] = worker.submit(SynthesisRequest(text=f"t{i}"))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(8)]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        elapsed = time.monotonic() - t0
        shed = [i for i, (res, err) in results.items()
                if err is not None and getattr(err, "code", 0) == 503]
        served = [i for i, (res, err) in results.items() if err is None]
        assert len(results) == 8
        assert shed, "burst above the queue bound must shed load"
        assert served, "admitted requests must still be served"
        for i in served:
            assert results[i][0] == f"ok:t{i}"
        # shed requests returned immediately, not after the slow engine
        assert elapsed < 8 * 0.25
        # server healthy afterwards
        res, err = worker.submit(SynthesisRequest(text="after"))
        assert err is None and res == "ok:after"
    finally:
        worker.stop()


def test_request_deadline_504_and_queued_drop():
    """A request slower than its deadline 504s; requests still queued at
    expiry are dropped without occupying an engine slot."""
    import time

    from valle_tpu.serving import SynthesisRequest

    engine_calls = []

    def slow_synth(reqs):
        engine_calls.append([r.text for r in reqs])
        time.sleep(0.5)
        return [f"ok:{r.text}" for r in reqs]

    worker = ServingWorker(slow_synth, batch_window_ms=10, max_batch=1,
                           request_timeout_s=0.3)
    worker.start()
    try:
        results = {}

        def post(i):
            results[i] = worker.submit(SynthesisRequest(text=f"t{i}"))

        # t0 occupies the engine (0.5s > 0.3s deadline) -> 504;
        # t1..t2 expire while queued -> dropped, never reach the engine
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
            time.sleep(0.02)   # deterministic arrival order
        for th in threads:
            th.join(timeout=30)
        assert all(getattr(err, "code", 0) == 504
                   for _, err in results.values()), results
        # queued-but-expired requests never spent engine time
        time.sleep(1.2)        # let the worker drain everything
        flat = [t for call in engine_calls for t in call]
        assert "t0" in flat
        assert len(flat) <= 2  # at most t0 (+possibly t1 if drained early)
    finally:
        worker.stop()


def test_http_admission_guards():
    """Oversized text / prompt_codes -> 413 before touching the engine."""
    calls = []

    def synth_fn(reqs):
        calls.append(len(reqs))
        return ["x"] * len(reqs)

    server, worker = make_server(synth_fn, port=0, batch_window_ms=5,
                                 max_text_len=50, max_prompt_frames=10)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post_expect(body, code):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == code
            return json.loads(ei.value.read())

        body = post_expect({"text": "x" * 100}, 413)
        assert "too large" in body["error"]
        post_expect({"text": "hi",
                     "prompt_codes": [[0] * 8] * 11}, 413)
        assert calls == []     # guards fire before the engine
    finally:
        server.shutdown()
        worker.stop()
        server.server_close()


def test_worker_surfaces_engine_errors():
    def boom(reqs):
        raise RuntimeError("engine exploded")

    worker = ServingWorker(boom, batch_window_ms=1)
    worker.start()
    try:
        res, err = worker.submit(object())
        assert res is None and "engine exploded" in err
    finally:
        worker.stop()


def test_http_server_dp_mesh_kernel_engine():
    """--dp static serving end to end: a DP-mesh Synthesizer with a
    kernel decode mode behind the HTTP worker (the bin/serve.py --dp
    wiring builds exactly this engine)."""
    from valle_tpu.parallel.mesh import make_mesh

    cfg = ValleConfig(d_model=128, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(
        model, params, TextTokenizer(backend="char"),
        TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_ "))),
        AudioTokenizer(), top_k=1, max_gen_len=16,
        compute_dtype=jnp.float32, decode_mode="fused",
        mesh=make_mesh(tp=1))

    server, worker = make_server(
        lambda reqs: synth.synthesize(reqs, max_gen_len=12),
        port=0, batch_window_ms=50, info={"mode": "static"})
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        data = json.dumps({
            "text": "hello mesh",
            "prompt_codes": np.random.RandomState(0).randint(
                0, 1024, (5, 8)).tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            blob = r.read()
        with wave.open(io.BytesIO(blob)) as w:
            assert w.getframerate() == 24000
            assert w.getnframes() > 0
    finally:
        server.shutdown()
        worker.stop()
        server.server_close()
