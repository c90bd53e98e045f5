"""HTTP inference servers over the serving engines.

The production front-ends the reference never had (its "serving" is
importing the training model code): thin stdlib HTTP layers over
``serving.StreamingEngine`` (streaming video encode) and
``lm_serving.DecodeEngine`` (continuous-batching generation). Request
handlers run on the ``ThreadingHTTPServer`` pool, but ALL engine calls —
and therefore all device dispatch — are routed through ONE worker thread
per engine via a command queue (two threads jit-dispatching deadlocks
some PJRT transports; same rule as serving.py's host loop). The worker
ticks the engine whenever its work predicate says a tick would make
progress and otherwise blocks on the queue, so an idle server burns no
cycles.

StreamingServer routes (frames are base64 of raw float32/uint8
(t, C, H, W)):

    POST /streams                      -> {"sid": int}
    POST /streams/<sid>/frames  {"frames_b64", "shape", "dtype"} -> {"ok"}
    POST /streams/<sid>/close          -> {"ok": true}
    GET  /streams/<sid>/features       -> {"features": [[...]], "done"}
    GET  /healthz                      -> {"ok", "slots", occupancy}

DecodeServer routes (prompt embeddings as base64 float32 (L, D) — build
them with ``LlavaQwenModel.prompt_embeds`` for the vision-spliced case):

    POST /requests  {"embeds_b64","shape","dtype"?,"max_new_tokens"?}
                                       -> {"rid": int}
    GET  /requests/<rid>/tokens        -> {"tokens": [...], "done"}
    GET  /healthz                      -> {"ok", "slots", occupancy}

Features/tokens are drained incrementally (the ``poll`` contract): each
GET returns only what was produced since the previous GET. Error
mapping: engine rejections (bad input, overflow) -> 400 with the
message; a dead engine actor -> 503 on every route (load balancers fail
over on 5xx); unknown routes -> 404.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Optional, Tuple

import numpy as np

from .config import StreamformerConfig
from .serving import StreamingEngine

__all__ = ["StreamingServer", "DecodeServer", "VideoQAServer"]


class _EngineActor:
    """Single-threaded executor owning an engine: every call runs on one
    worker thread, preserving the one-dispatch-thread rule.

    ``has_work`` decides whether ``engine.tick()`` would make progress —
    it must be precise (no false positives) or the actor busy-spins on
    no-op ticks."""

    def __init__(self, engine, has_work: Callable[[], bool]):
        self._engine = engine
        self._has_work = has_work
        self._q: "queue.Queue" = queue.Queue()
        self._stop = object()
        self._fatal: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            try:
                # tick opportunistically while work is queued; block when idle
                item = self._q.get(
                    timeout=0.0 if self._has_work() else None
                )
            except queue.Empty:
                try:
                    self._engine.tick()
                except BaseException as e:  # engine broken: die loudly —
                    # call() surfaces this to every future HTTP request
                    self._fatal = e
                    return
                continue
            if item is self._stop:
                return
            fn, args, out = item
            try:
                out["result"] = fn(self._engine, *args)
            except Exception as e:  # surfaced to the HTTP caller as a 400
                out["error"] = e
            out["event"].set()

    def call(self, fn: Callable, *args) -> Any:
        out: dict = {"event": threading.Event()}
        self._q.put((fn, args, out))
        # never wait on a dead actor: a tick() crash must become an HTTP
        # error, not a hung connection
        while not out["event"].wait(timeout=1.0):
            if not self._thread.is_alive():
                raise _ActorDied(f"engine actor died: {self._fatal!r}")
        if "error" in out:
            raise out["error"]
        return out["result"]

    def shutdown(self):
        self._q.put(self._stop)
        self._thread.join(timeout=10)


class _ActorDied(RuntimeError):
    """The engine thread crashed — a server-down condition (503)."""


class _JSONHandler(BaseHTTPRequestHandler):
    """Shared JSON plumbing for both servers' handlers."""

    # quiet by default; real deployments hook their own logging
    def log_message(self, *a):
        pass

    def _json(self, code: int, payload: dict) -> bool:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        return True  # "responded" — _guarded treats None as no-route

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def _guarded(self, fn):
        """Run a route body. Engine rejections -> 400; a dead engine
        actor -> 503 (server-down, so 5xx-keyed retry/failover works);
        fn returning None -> 404."""
        try:
            if fn() is None:
                self._json(404, {"error": f"no route {self.path}"})
        except _ActorDied as e:
            self._json(503, {"ok": False, "error": str(e)})
        except Exception as e:
            self._json(400, {"error": str(e)})


class _HTTPServerBase:
    """start()/stop() scaffolding shared by both servers."""

    _actor: Optional[_EngineActor]

    def __init__(self, host: str, port: int):
        self._actor = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._host, self.port = host, port
        self._serve_thread: Optional[threading.Thread] = None

    def _start_http(self, handler_cls):
        self._httpd = ThreadingHTTPServer((self._host, self.port),
                                          handler_cls)
        self.port = self._httpd.server_address[1]
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._serve_thread.start()
        return self

    def _healthz_payload(self, slots: int, stats_op) -> dict:
        stats = self._actor.call(stats_op)
        return {"ok": True, "slots": slots, **stats}

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._actor is not None:
            self._actor.shutdown()


class StreamingServer(_HTTPServerBase):
    """Serve streaming encode over HTTP.

    >>> srv = StreamingServer(params, cfg, slots=8, port=0)
    >>> srv.start()           # non-blocking; srv.port is the bound port
    >>> ... HTTP traffic ...
    >>> srv.stop()
    """

    def __init__(
        self,
        params,
        cfg: StreamformerConfig,
        slots: int = 8,
        host: str = "127.0.0.1",
        port: int = 0,
        **engine_kw,
    ):
        super().__init__(host, port)
        # linear cache mode by default (NOT the engine's "auto", which
        # resolves to ring on TPU): ring's feed-or-close contract cannot be
        # met by independent HTTP clients whose feeds arrive in bursts
        # between ticks — a momentarily starved slot would assert. Linear
        # holds starved slots losslessly. Pass mode="ring" explicitly only
        # for lockstep always-fed deployments.
        engine_kw.setdefault("mode", "linear")
        self._engine = StreamingEngine(params, cfg, slots=slots, **engine_kw)

    # -- engine ops (run on the actor thread) ------------------------------
    @staticmethod
    def _op_open(e):  # noqa: ANN001 — engine-actor calling convention
        return e.open()

    @staticmethod
    def _op_feed(e, sid, frames):
        e.feed(sid, frames)
        return True

    @staticmethod
    def _op_close(e, sid):
        e.close(sid)
        return True

    @staticmethod
    def _op_poll(e, sid):
        feats, done = e.poll(sid)
        return feats, done

    @staticmethod
    def _op_stats(e):
        return {
            "active_streams": e.active_streams(),
            "slots_occupied": sum(s is not None for s in e._slot_sid),
        }

    def start(self):
        # the work predicate lives on the engine (has_work), next to the
        # scheduling code it mirrors — the server must never re-encode
        # admission rules
        self._actor = _EngineActor(self._engine, self._engine.has_work)
        server = self

        class Handler(_JSONHandler):
            def _route(self) -> Tuple[str, Optional[int], str]:
                parts = [p for p in self.path.split("/") if p]
                if parts == ["healthz"]:
                    return "healthz", None, ""
                if parts and parts[0] == "streams":
                    if len(parts) == 1:
                        return "streams", None, ""
                    try:
                        sid = int(parts[1])
                    except ValueError:  # non-numeric id -> 404, not a
                        return "", None, ""  # dropped connection
                    return "streams", sid, (
                        parts[2] if len(parts) > 2 else ""
                    )
                return "", None, ""

            def do_GET(self):
                kind, sid, leaf = self._route()

                def run():
                    if kind == "healthz":
                        return self._json(200, server._healthz_payload(
                            server._engine.slots, server._op_stats
                        ))
                    if kind == "streams" and sid is not None \
                            and leaf == "features":
                        feats, done = server._actor.call(
                            server._op_poll, sid
                        )
                        return self._json(
                            200,
                            {"features": np.asarray(feats).tolist(),
                             "done": bool(done)},
                        )
                    return None  # 404

                self._guarded(run)

            def do_POST(self):
                kind, sid, leaf = self._route()

                def run():
                    if kind == "streams" and sid is None:
                        return self._json(
                            200,
                            {"sid": server._actor.call(server._op_open)},
                        )
                    if kind == "streams" and sid is not None:
                        if leaf == "frames":
                            b = self._body()
                            raw = base64.b64decode(b["frames_b64"])
                            arr = np.frombuffer(
                                raw,
                                dtype=np.dtype(b.get("dtype", "float32")),
                            ).reshape(b["shape"])
                            server._actor.call(server._op_feed, sid, arr)
                            return self._json(200, {"ok": True})
                        if leaf == "close":
                            server._actor.call(server._op_close, sid)
                            return self._json(200, {"ok": True})
                    return None  # 404

                self._guarded(run)

        return self._start_http(Handler)




class DecodeServer(_HTTPServerBase):
    """Serve LM generation (lm_serving.DecodeEngine) over HTTP — see the
    module docstring for routes. Same single-dispatch-thread actor design
    as StreamingServer."""

    _PREFIX = "requests"

    def __init__(self, params, lm_cfg, host: str = "127.0.0.1",
                 port: int = 0, **engine_kw):
        from .lm_serving import DecodeEngine

        super().__init__(host, port)
        self._engine = DecodeEngine(params, lm_cfg, **engine_kw)

    @staticmethod
    def _op_open(e, emb, max_new):
        if max_new is None:
            return e.open(emb)
        return e.open(emb, max_new_tokens=max_new)

    @staticmethod
    def _op_poll(e, rid):
        return e.poll(rid)

    @staticmethod
    def _op_stats(e):
        return {
            "slots_occupied": sum(s is not None for s in e._slot_sid),
            "pending": len(e._pending),
        }

    def _post_open(self, body: dict) -> int:
        """Parse a submission body and admit it; runs on the HTTP thread —
        device work belongs in the actor op. Subclasses override."""
        raw = base64.b64decode(body["embeds_b64"])
        emb = np.frombuffer(
            raw, dtype=np.dtype(body.get("dtype", "float32"))
        ).reshape(body["shape"])
        return self._actor.call(
            self._op_open, emb, body.get("max_new_tokens")
        )

    def start(self):
        self._actor = _EngineActor(self._engine, self._engine.has_work)
        server = self

        class Handler(_JSONHandler):
            def do_POST(self):
                parts = [p for p in self.path.split("/") if p]

                def run():
                    if parts == [server._PREFIX]:
                        return self._json(
                            200, {"rid": server._post_open(self._body())}
                        )
                    return None  # 404

                self._guarded(run)

            def do_GET(self):
                parts = [p for p in self.path.split("/") if p]

                def run():
                    if parts == ["healthz"]:
                        return self._json(200, server._healthz_payload(
                            server._engine.slots, server._op_stats
                        ))
                    if (len(parts) == 3 and parts[0] == server._PREFIX
                            and parts[2] == "tokens"):
                        try:
                            rid = int(parts[1])
                        except ValueError:
                            return None  # 404
                        toks, done = server._actor.call(
                            server._op_poll, rid
                        )
                        return self._json(
                            200, {"tokens": [int(t) for t in toks],
                                  "done": bool(done)},
                        )
                    return None  # 404

                self._guarded(run)

        return self._start_http(Handler)


class VideoQAServer(DecodeServer):
    """One-stop VideoQA service: video frames + question in, tokens out.

    Routes (JSON; frames are base64 of raw float32 (T, C, H, W)):

        POST /qa  {"prompt_ids": [...], "frames_b64", "shape",
                   "dtype"?, "max_new_tokens"?}        -> {"rid": int}
        GET  /qa/<rid>/tokens                          -> {"tokens", "done"}
        GET  /healthz                                  -> {"ok", ...}

    ``prompt_ids`` uses the model's tokenizer ids with IMAGE_TOKEN_INDEX
    placeholders; the server runs the vision tower + projector + splice
    (``LlavaQwenModel.prompt_embeds``) and admits the request into the
    continuous-batching DecodeEngine. ALL device work — including the
    tower encode and the host->device frame transfer — happens inside the
    actor op, preserving the one-dispatch-thread rule across both models.

    Requires a NON-streaming tower: a streaming tower holds per-session
    context, so independent concurrent requests would contaminate each
    other's vision features (and a linear-cache tower would eventually
    reject all traffic once cumulative frames pass its capacity).
    """

    _PREFIX = "qa"

    def __init__(self, model, host: str = "127.0.0.1", port: int = 0,
                 **engine_kw):
        from .lm_serving import DecodeEngine

        if getattr(model.tower, "streaming_mode", False):
            raise ValueError(
                "VideoQAServer requires a non-streaming tower "
                "(TimesformerVisionTower(..., streaming_mode=False)): "
                "streaming towers hold per-session context that would leak "
                "across independent HTTP requests"
            )
        _HTTPServerBase.__init__(self, host, port)
        self._model = model  # downstream.videoqa.LlavaQwenModel
        self._engine = DecodeEngine(model.params["lm"], model.lm_cfg,
                                    **engine_kw)

    def _op_ask(self, e, prompt_ids, frames, max_new):
        # runs on the actor thread: host->device transfer, tower forward,
        # projector, splice, then admission — all device work on this one
        # thread
        import jax.numpy as jnp

        px = jnp.asarray(frames, jnp.float32)[None]
        emb = self._model.prompt_embeds(prompt_ids, px)
        if max_new is None:
            return e.open(np.asarray(emb))
        return e.open(np.asarray(emb), max_new_tokens=max_new)

    def _post_open(self, body: dict) -> int:
        raw = base64.b64decode(body["frames_b64"])
        frames = np.frombuffer(
            raw, dtype=np.dtype(body.get("dtype", "float32"))
        ).reshape(body["shape"])
        ids = np.asarray(body["prompt_ids"], np.int64)
        return self._actor.call(
            self._op_ask, ids, frames, body.get("max_new_tokens")
        )
