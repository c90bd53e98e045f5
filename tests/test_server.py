"""HTTP serving front-end (streamformer_tpu/server.py).

Drives the real ThreadingHTTPServer over a socket: open/feed/close/poll
via JSON+base64, multiple concurrent streams over fewer slots, feature
parity with the lone-stream oracle, and error surfacing (linear-cache
overflow -> HTTP 400). All device work stays on the engine actor thread.
"""

import base64
import json
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

import jax

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.server import StreamingServer

from test_serving import CFG, lone_stream


@pytest.fixture(scope="module")
def params():
    return encoder.init_params(jax.random.PRNGKey(0), CFG)


def _req(port, method, path, payload=None):
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _frames_payload(arr: np.ndarray) -> dict:
    arr = np.ascontiguousarray(arr, np.float32)
    return {
        "frames_b64": base64.b64encode(arr.tobytes()).decode(),
        "shape": list(arr.shape),
        "dtype": "float32",
    }


def test_http_server_end_to_end(params):
    rng = np.random.default_rng(0)
    lens = [3, 5, 2]
    clips = [rng.standard_normal((n, 3, 32, 32)).astype(np.float32)
             for n in lens]

    srv = StreamingServer(params, CFG, slots=2, port=0).start()
    try:
        assert _req(srv.port, "GET", "/healthz")["ok"]

        sids = []
        for clip in clips:
            sid = _req(srv.port, "POST", "/streams")["sid"]
            _req(srv.port, "POST", f"/streams/{sid}/frames",
                 _frames_payload(clip))
            _req(srv.port, "POST", f"/streams/{sid}/close")
            sids.append(sid)

        got, acc = {}, {}
        deadline = time.time() + 120
        while len(got) < len(sids) and time.time() < deadline:
            for sid in sids:
                if sid in got:
                    continue
                r = _req(srv.port, "GET", f"/streams/{sid}/features")
                # an empty poll round-trips through JSON as [], shape (0,):
                # normalize to (t, D) before accumulating
                feats = np.asarray(r["features"], np.float32).reshape(
                    -1, CFG.hidden_size
                )
                prev = acc.get(sid)
                acc[sid] = (feats if prev is None
                            else np.concatenate([prev, feats]))
                if r["done"]:
                    got[sid] = acc[sid]
            time.sleep(0.05)

        for sid, clip in zip(sids, clips):
            assert sid in got, f"stream {sid} never finished"
            np.testing.assert_allclose(
                got[sid], lone_stream(params, clip), rtol=0, atol=1e-5,
                err_msg=f"stream {sid}",
            )
    finally:
        srv.stop()


def test_http_server_concurrent_clients(params):
    """Production-shaped traffic: 4 client threads each running 3 streams
    over a 2-slot engine, feeding in random chunks with delays and polling
    interleaved — every stream must match its lone oracle exactly."""
    import threading

    rng = np.random.default_rng(3)
    n_clients, per_client = 4, 3
    clips = {}
    for c in range(n_clients):
        for j in range(per_client):
            n = int(rng.integers(2, 7))
            clips[(c, j)] = rng.standard_normal(
                (n, 3, 32, 32)).astype(np.float32)

    srv = StreamingServer(params, CFG, slots=2, port=0).start()
    results, errors = {}, []

    def client(c):
        try:
            local = np.random.default_rng(c)
            for j in range(per_client):
                clip = clips[(c, j)]
                sid = _req(srv.port, "POST", "/streams")["sid"]
                pos = 0
                while pos < len(clip):  # bursty chunked feeds
                    k = int(local.integers(1, 3))
                    _req(srv.port, "POST", f"/streams/{sid}/frames",
                         _frames_payload(clip[pos:pos + k]))
                    pos += k
                    time.sleep(float(local.uniform(0, 0.02)))
                _req(srv.port, "POST", f"/streams/{sid}/close")
                acc, deadline = [], time.time() + 120
                while time.time() < deadline:
                    r = _req(srv.port, "GET", f"/streams/{sid}/features")
                    f = np.asarray(r["features"], np.float32).reshape(
                        -1, CFG.hidden_size)
                    if len(f):
                        acc.append(f)
                    if r["done"]:
                        break
                    time.sleep(0.02)
                else:
                    raise TimeoutError(f"stream {sid} never finished")
                results[(c, j)] = np.concatenate(acc) if acc else np.zeros(
                    (0, CFG.hidden_size), np.float32)
        except Exception as e:
            errors.append((c, repr(e)))

    try:
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors, errors
        for key, clip in clips.items():
            np.testing.assert_allclose(
                results[key], lone_stream(params, clip),
                rtol=0, atol=1e-5, err_msg=str(key),
            )
    finally:
        srv.stop()


def test_decode_server_end_to_end():
    """LM generation over HTTP: two requests with different prompts served
    concurrently match their lone greedy_generate answers; healthz reports
    occupancy."""
    from streamformer_tpu.models import language_model as LM
    from streamformer_tpu.server import DecodeServer
    from test_language_model import SMALL as LM_CFG

    lm_params = LM.init_params(jax.random.PRNGKey(4), LM_CFG)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, LM_CFG.vocab_size, size=(n,))
               for n in (3, 6)]

    def emb(ids):
        import jax.numpy as jnp
        return np.asarray(
            LM.embed_tokens(lm_params, jnp.asarray(ids)), np.float32
        )

    refs = []
    for ids in prompts:
        import jax.numpy as jnp
        refs.append([int(t) for t in LM.greedy_generate(
            lm_params, LM_CFG, jnp.asarray(emb(ids)[None]),
            max_new_tokens=4, capacity=24,
        )[0]])

    srv = DecodeServer(lm_params, LM_CFG, port=0, slots=2, capacity=24,
                       max_new_tokens=4, prefill_buckets=(8,)).start()
    try:
        h = _req(srv.port, "GET", "/healthz")
        assert h["ok"] and h["slots"] == 2

        rids = []
        for ids in prompts:
            e = emb(ids)
            r = _req(srv.port, "POST", "/requests", {
                "embeds_b64": base64.b64encode(
                    np.ascontiguousarray(e).tobytes()).decode(),
                "shape": list(e.shape),
            })
            rids.append(r["rid"])

        got, acc = {}, {}
        deadline = time.time() + 120
        while len(got) < len(rids) and time.time() < deadline:
            for rid in rids:
                if rid in got:
                    continue
                r = _req(srv.port, "GET", f"/requests/{rid}/tokens")
                acc[rid] = acc.get(rid, []) + r["tokens"]
                if r["done"]:
                    got[rid] = acc[rid]
            time.sleep(0.05)

        for rid, ref in zip(rids, refs):
            assert rid in got, f"request {rid} never finished"
            assert got[rid] == ref, (got[rid], ref)
    finally:
        srv.stop()


def test_videoqa_server_end_to_end():
    """One-stop VideoQA over HTTP: tokenized question + raw frames in,
    tokens out — the server runs tower+splice on the engine actor thread;
    answers match lone model.generate."""
    from streamformer_tpu.downstream import videoqa as VQ
    from streamformer_tpu.downstream.vision_tower import (
        TimesformerVisionTower,
    )
    from streamformer_tpu.models import language_model as LM
    from streamformer_tpu.models import encoder as enc
    from streamformer_tpu.server import VideoQAServer
    from test_videoqa import CFG as TOWER_CFG, LM_DIM, _small_lm

    lm_cfg, lm_params = _small_lm()
    tower_params = enc.init_params(jax.random.PRNGKey(0), TOWER_CFG)
    proj = VQ.init_mm_projector(jax.random.PRNGKey(1),
                                TOWER_CFG.hidden_size, LM_DIM)
    model = VQ.LlavaQwenModel(
        tower=TimesformerVisionTower(TOWER_CFG, tower_params,
                                     streaming_mode=False),
        lm_cfg=lm_cfg, params={"projector": proj, "lm": lm_params},
    )

    rng = np.random.default_rng(12)
    videos = [rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
              for _ in range(2)]
    prompts = [np.array([3, VQ.IMAGE_TOKEN_INDEX, 9, 12]),
               np.array([5, VQ.IMAGE_TOKEN_INDEX, 2])]
    import jax.numpy as jnp
    refs = [[int(t) for t in model.generate(p, jnp.asarray(v)[None],
                                            max_new_tokens=3)[0]]
            for p, v in zip(prompts, videos)]

    # a streaming tower holds per-session context: rejected at construction
    with pytest.raises(ValueError, match="non-streaming"):
        VideoQAServer(VQ.LlavaQwenModel(
            tower=TimesformerVisionTower(TOWER_CFG, tower_params,
                                         streaming_mode=True),
            lm_cfg=lm_cfg, params={"projector": proj, "lm": lm_params},
        ))

    srv = VideoQAServer(model, port=0, slots=2, capacity=32,
                        max_new_tokens=3, prefill_buckets=(8, 16)).start()
    try:
        rids = []
        for p, v in zip(prompts, videos):
            r = _req(srv.port, "POST", "/qa", {
                "prompt_ids": [int(x) for x in p],
                "frames_b64": base64.b64encode(
                    np.ascontiguousarray(v).tobytes()).decode(),
                "shape": list(v.shape),
            })
            rids.append(r["rid"])
        got, acc = {}, {}
        deadline = time.time() + 120
        while len(got) < len(rids) and time.time() < deadline:
            for rid in rids:
                if rid in got:
                    continue
                r = _req(srv.port, "GET", f"/qa/{rid}/tokens")
                acc[rid] = acc.get(rid, []) + r["tokens"]
                if r["done"]:
                    got[rid] = acc[rid]
            time.sleep(0.05)
        for rid, ref in zip(rids, refs):
            assert rid in got, f"request {rid} never finished"
            assert got[rid] == ref, (got[rid], ref)
    finally:
        srv.stop()


def test_http_server_errors(params):
    srv = StreamingServer(params, CFG, slots=1, port=0).start()
    try:
        sid = _req(srv.port, "POST", "/streams")["sid"]
        too_long = np.zeros(
            (CFG.cache_capacity + 1, 3, 32, 32), np.float32
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(srv.port, "POST", f"/streams/{sid}/frames",
                 _frames_payload(too_long))
        assert ei.value.code == 400
        assert "exceed" in json.loads(ei.value.read())["error"]

        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(srv.port, "GET", "/nope")
        assert ei.value.code == 404

        # non-numeric stream id: JSON 404, not a dropped connection
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(srv.port, "GET", "/streams/abc/features")
        assert ei.value.code == 404

        # unknown numeric stream id: engine assert -> JSON 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(srv.port, "GET", "/streams/999/features")
        assert ei.value.code == 400
    finally:
        srv.stop()
