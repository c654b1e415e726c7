"""Inference/serving path.

The reference's "serving" story is ``test_mosi.py``: load a released
checkpoint, run one full-test-set forward, print metrics, plus an ad-hoc
latency probe (``test_mosi.py:335-342``). This module is the production
equivalent:

- :class:`Predictor` — loads a checkpoint (or takes params), jits the
  forward once, exposes numpy-in/numpy-out ``predict`` with automatic
  batch padding (static shapes for XLA), and a latency ``probe``.
- :func:`serve_http` — a minimal JSON-over-HTTP endpoint
  (stdlib ``http.server``) for online scoring.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.config import MFMConfig
from factorized_tpu.models import get_model


class Predictor:
    def __init__(self, cfg: MFMConfig, params, model_type: Optional[str] = None,
                 batch_size: int = 256):
        self.cfg = cfg
        self.params = params
        self.batch_size = batch_size
        name = model_type or cfg.model_type
        supported = ("mfm", "kl", "kl_ef", "missing",
                     "m_a", "m_b", "m_c", "m_d", "mfn")
        if name not in supported:
            raise ValueError(
                f"Predictor supports the standard-return model types "
                f"{supported}, got {name!r} (s2s/bm have different "
                f"outputs - load them through their trainers)")
        _, apply_fn = get_model(name)
        self._name = name

        # weights are frozen at serving time: close over them so they
        # trace as compile-time constants — XLA folds the block-diagonal
        # weight assembly (ops/fused.py) and the decoder's wx+wh sum
        # once at compile instead of on every forward. Tradeoff: the
        # program now embeds the weight values, so the persistent
        # compile cache cannot share compilations ACROSS checkpoints of
        # the same config — each new Predictor pays one compile, which
        # a long-lived serving process amortizes.
        params_dev = jax.device_put(params)

        @jax.jit
        def fwd_const(x):
            out = apply_fn(params_dev, x, cfg, key=jax.random.PRNGKey(0),
                           train=False)
            # the standalone MFN predictor returns predictions directly
            # (the reference's released mfn_mae.pt model family,
            # test_mosi.py:269-482); MFM-family models return
            # (decoded, reg, missing) with y_hat = decoded[3]
            y_hat = out if name == "mfn" else out[0][3]
            # scalar regression -> (n,); multitrait regression keeps
            # (n, n_traits) — one column per trait (the multitrait
            # trainer's contract, trainers.train_mfm_multitrait)
            return (jnp.squeeze(y_hat, 1)
                    if cfg.task == "regression" and cfg.output_dim == 1
                    else y_hat)

        # keep the (params, x) call shape predict/probe/export share
        # with ExportedPredictor. The runtime params arg is checked, not
        # used: weights are FROZEN into fwd_const above, so reassigning
        # predictor.params (e.g. a checkpoint hot-reload) would silently
        # keep serving the construction-time weights — fail loudly
        # instead (hot-reload = build a new Predictor).
        frozen = params

        def _fwd(p, x):
            # host-side identity check (p itself may be a tracer inside
            # device_latency's jitted chain — never inspect it)
            if self.params is not frozen:
                raise ValueError(
                    "Predictor weights are frozen at construction "
                    "(compiled as constants); build a new Predictor "
                    "instead of reassigning .params")
            return fwd_const(x)

        self._fwd = _fwd

    @classmethod
    def from_checkpoint(cls, path: str, **kw):
        from factorized_tpu.utils.checkpoint import restore_checkpoint

        with open(f"{path}/meta.json") as f:
            meta = json.load(f)
        cfg = MFMConfig(**{k: v for k, v in meta["config"].items()
                           if k in MFMConfig.__dataclass_fields__})
        init, _ = get_model(cfg.model_type)
        template = init(jax.random.PRNGKey(0), cfg)
        state, _ = restore_checkpoint(path, target={"params": template})
        return cls(cfg, state["params"], **kw)

    def _empty_result(self):
        """Shape-correct zero-length result: (0,) for scalar
        regression, (0, C) for classification logits and multitrait
        regression (the nonzero-input contract)."""
        if self.cfg.task == "classification" or self.cfg.output_dim > 1:
            return np.zeros((0, self.cfg.output_dim), np.float32)
        return np.zeros((0,), np.float32)

    def _pad_to_batch(self, chunk):
        """Zero-pad rows up to the static serving batch size. Returns
        (padded, n_pad)."""
        pad = self.batch_size - chunk.shape[0]
        if pad > 0:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
        return chunk, max(pad, 0)

    def predict(self, X):
        """X batch-major (n, t, d_total) numpy -> predictions (n,) or
        logits (n, C). Pads the final partial batch to keep shapes
        static (at most 2 compiled batch shapes ever)."""
        X = np.asarray(X, np.float32)
        n = X.shape[0]
        if n == 0:
            return self._empty_result()
        outs = []
        B = self.batch_size
        for s in range(0, n, B):
            chunk, pad = self._pad_to_batch(X[s:s + B])
            xt = jnp.asarray(chunk.swapaxes(0, 1))
            y = np.asarray(self._fwd(self.params, xt))
            outs.append(y[: B - pad] if pad else y)
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    def autotune(self, X, candidates=(64, 128, 256, 512, 1024),
                 reps: int = 3):
        """Pick the serving batch size that maximizes end-to-end
        throughput on this host/device for ``X``-shaped traffic.
        Compiles one program per candidate (persistent compilation cache
        makes re-tuning cheap), measures ``reps`` timed full passes
        each, sets ``self.batch_size`` to the winner, and returns
        ``{batch_size: samples/s}``. Throughput includes host<->device
        transfer — what a serving caller actually observes."""
        X = np.asarray(X, np.float32)
        n = X.shape[0]
        results = {}
        for B in candidates:
            if B > 2 * n and results:
                continue  # mostly-padding batches: strictly worse
            self.batch_size = int(B)
            self.predict(X)  # warmup/compile at this shape
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                self.predict(X)
                times.append(time.perf_counter() - t0)
            results[int(B)] = float(n / np.median(times))
        self.batch_size = max(results, key=results.get)
        return results

    def probe(self, X, reps: int = 10):
        """Latency probe (the reference's ``test_mosi.py:335-342``
        upgraded): median end-to-end seconds for one full forward."""
        times = []
        self.predict(X)  # warmup/compile
        for _ in range(reps):
            t0 = time.perf_counter()
            self.predict(X)
            times.append(time.perf_counter() - t0)
        return {
            "n": int(np.asarray(X).shape[0]),
            "median_s": float(np.median(times)),
            "p99_s": float(np.quantile(times, 0.99)),
            "throughput_per_s": float(np.asarray(X).shape[0]
                                      / np.median(times)),
        }

    def device_latency(self, X, iters: int = 100):
        """Pure ON-DEVICE per-forward latency, excluding host<->device
        transfer and dispatch RTT (through the axon tunnel those
        dominate ``probe``): one jitted program chains ``iters``
        forwards with a data dependency (so XLA cannot elide them),
        runs once after warmup, and the wall time divides by
        ``iters``."""
        X, _ = self._pad_to_batch(np.asarray(X, np.float32)
                                  [: self.batch_size])
        xt = jax.device_put(jnp.asarray(X.swapaxes(0, 1)))
        params = jax.device_put(self.params)
        fwd = self._fwd

        @jax.jit
        def chained(params, x):
            def body(i, carry):
                # carry feeds the input at below-float32-epsilon scale:
                # a real data dependency (no hoisting/DCE), no effect on
                # the computed values
                y = fwd(params, x + 1e-30 * carry.mean())
                return (y if y.ndim == 1 else y[:, 0]).astype(jnp.float32)

            y0 = jnp.zeros((x.shape[1],), jnp.float32)
            return jax.lax.fori_loop(0, iters, body, y0)

        float(np.asarray(chained(params, xt))[0])  # warmup/compile
        t0 = time.perf_counter()
        out = chained(params, xt)
        np.asarray(out)  # materialize through the tunnel
        total = time.perf_counter() - t0
        return {
            "batch": int(self.batch_size),
            "iters": int(iters),
            "latency_s": total / iters,
            "throughput_per_s": float(self.batch_size * iters / total),
        }


    # ------------------------------------------------ AOT export/load

    def export(self, path: str, symbolic_batch: bool = True):
        """Serialize the jitted forward into ONE portable artifact via
        ``jax.export`` — weights ride along as closure constants, so
        the serving host needs jax and this file, not the framework's
        model code or a checkpoint. The artifact is platform-tagged for
        the CURRENT backend.

        By default the batch dimension is exported SYMBOLIC
        (``jax.export.symbolic_shape``): one artifact serves any batch
        size — the loader pads to its tuned ``batch_size`` (meta
        records the export-time value as the starting point) and
        ``ExportedPredictor.autotune`` stays available. Pass
        ``symbolic_batch=False`` to pin the batch shape into the
        artifact (the pre-r5 behavior; autotune then refuses).

        Writes ``<path>/exported.bin`` + ``<path>/meta.json``."""
        import os

        from jax import export as jexport

        t, d = self.cfg.seqlength, sum(self.cfg.input_dims)
        if symbolic_batch:
            (b,) = jexport.symbolic_shape("b")
        else:
            b = self.batch_size
        x_spec = jax.ShapeDtypeStruct((t, b, d), jnp.float32)
        params = self.params
        fwd = self._fwd
        exp = jexport.export(jax.jit(lambda x: fwd(params, x)))(x_spec)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "exported.bin"), "wb") as f:
            f.write(exp.serialize())
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({
                "config": self.cfg.to_dict(),
                "model_type": self._name,
                "batch_size": int(self.batch_size),
                "symbolic_batch": bool(symbolic_batch),
                "platforms": list(exp.platforms),
            }, f)
        return path

    @classmethod
    def from_exported(cls, path: str) -> "ExportedPredictor":
        return ExportedPredictor(path)


class ExportedPredictor(Predictor):
    """Serve from a ``Predictor.export`` artifact: same numpy-in/out
    ``predict`` (padding to ``batch_size``), no model code or params
    needed. Symbolic-batch artifacts (the export default) serve ANY
    batch size — one compile per concrete shape at call time — so
    ``autotune`` works normally; fixed-shape artifacts
    (``symbolic_batch=False``) refuse it."""

    def __init__(self, path: str):
        import os

        from jax import export as jexport

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        from factorized_tpu.config import MFMConfig as _Cfg

        self.cfg = _Cfg(**{k: v for k, v in meta["config"].items()
                           if k in _Cfg.__dataclass_fields__})
        self._name = meta["model_type"]
        self.batch_size = int(meta["batch_size"])
        self._symbolic = bool(meta.get("symbolic_batch", False))
        self.params = ()  # weights live inside the artifact
        with open(os.path.join(path, "exported.bin"), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        backend = jax.default_backend()
        if backend not in exp.platforms:
            raise ValueError(
                f"artifact was exported for {list(exp.platforms)}, "
                f"this process runs on {backend!r} — re-export on the "
                f"serving platform")
        # jit the artifact call: exp.call alone re-runs StableHLO
        # refinement per invocation; under jit each concrete batch
        # shape compiles once and caches
        self._call = jax.jit(exp.call)
        self._fwd = lambda params, x: self._call(x)

    def autotune(self, *a, **kw):
        if not self._symbolic:
            raise NotImplementedError(
                "this artifact was exported with symbolic_batch=False "
                "(fixed batch shape); re-export with the default "
                "symbolic batch, or run autotune() before export()")
        return super().autotune(*a, **kw)


class MicroBatcher:
    """Dynamic request coalescing for online serving.

    The reference has no serving story at all; this is the TPU-idiomatic
    answer to concurrent small requests: a single worker thread drains a
    queue, concatenates waiting requests into ONE device batch (up to
    ``max_batch`` samples, waiting at most ``max_wait_ms`` after the
    first arrival), runs one padded forward, and scatters the results
    back. N concurrent 2-sample requests cost one tunnel round-trip
    instead of N — on-device latency is ~0.5 ms per 256-batch
    (VALIDATION.md §5), so coalescing is nearly free compute-wise and
    wins the entire serialized-RTT cost.

    ``submit`` is thread-safe and blocks until the caller's slice is
    ready; exceptions from the batched forward propagate to every
    caller in that batch.
    """

    def __init__(self, predictor: Predictor, max_batch: Optional[int] = None,
                 max_wait_ms: float = 3.0):
        import queue
        import threading

        self.predictor = predictor
        self.max_batch = int(max_batch or predictor.batch_size)
        self.max_wait = max_wait_ms / 1e3
        self.batches_run = 0       # observability: forwards executed
        self.requests_served = 0   # vs requests coalesced into them
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serializes the stop-check+enqueue in submit() against close()
        # setting _stop: without it a request could pass the check, be
        # enqueued after close() drained the queue, and block its
        # caller forever on ev.wait()
        self._close_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="microbatcher")
        self._thread.start()

    def submit(self, x):
        """x (n, t, d) -> predictions for exactly these n samples."""
        import threading

        x = np.asarray(x, np.float32)
        # validate BEFORE enqueueing: a malformed request must fail
        # alone, never poison the batch it would be coalesced into
        t = self.predictor.cfg.seqlength
        d = sum(self.predictor.cfg.input_dims)
        if x.ndim != 3 or x.shape[1:] != (t, d):
            raise ValueError(
                f"expected input shape (n, {t}, {d}), got {x.shape}")
        if x.shape[0] == 0:
            return self.predictor._empty_result()
        box = {}
        ev = threading.Event()
        with self._close_lock:
            if self._stop.is_set():
                raise RuntimeError(
                    "MicroBatcher is closed - no worker will serve this "
                    "request")
            self._queue.put((x, box, ev))
        ev.wait()
        if "error" in box:
            raise box["error"]
        return box["y"]

    def _loop(self):
        import queue

        while not self._stop.is_set():
            try:
                batch = [self._queue.get(timeout=0.1)]
            except queue.Empty:
                continue
            total = batch[0][0].shape[0]
            deadline = time.perf_counter() + self.max_wait
            while total < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                batch.append(item)
                total += item[0].shape[0]
            try:
                y = self.predictor.predict(
                    np.concatenate([b[0] for b in batch]))
                o = 0
                for x, box, ev in batch:
                    box["y"] = y[o:o + x.shape[0]]
                    o += x.shape[0]
                    ev.set()
                self.batches_run += 1
                self.requests_served += len(batch)
            except Exception as e:  # noqa: BLE001 - fan out to callers
                for _, box, ev in batch:
                    box["error"] = e
                    ev.set()

    def close(self):
        import queue

        with self._close_lock:
            # after this, submit() raises instead of enqueueing — every
            # already-enqueued request is either served by the worker or
            # failed by the drain below
            self._stop.set()
        self._thread.join(timeout=2)
        # fail any request that raced the shutdown instead of letting
        # its caller block forever on ev.wait()
        while True:
            try:
                _, box, ev = self._queue.get_nowait()
            except queue.Empty:
                break
            box["error"] = RuntimeError("MicroBatcher closed")
            ev.set()


def serve_http(predictor: Predictor, host: str = "127.0.0.1",
               port: int = 8787, micro_batch: bool = True,
               max_wait_ms: float = 3.0):
    """Blocking JSON HTTP endpoint: POST /predict {"x": [[...t x d...]]}
    -> {"y": [...]}; GET /health -> model info.

    Threaded server so a slow client can't stall other connections.
    With ``micro_batch`` (default) concurrent requests are coalesced
    into single device batches by :class:`MicroBatcher`; otherwise
    device access is serialized by a lock."""
    import threading

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    device_lock = threading.Lock()
    batcher = (MicroBatcher(predictor, max_wait_ms=max_wait_ms)
               if micro_batch else None)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/health":
                self.send_error(404)
                return
            info = {
                "status": "ok",
                "model_type": predictor._name,
                "task": predictor.cfg.task,
                "seqlength": predictor.cfg.seqlength,
                "d_total": sum(predictor.cfg.input_dims),
                "batch_size": predictor.batch_size,
                "micro_batch": batcher is not None,
            }
            if batcher is not None:
                info["batches_run"] = batcher.batches_run
                info["requests_served"] = batcher.requests_served
            body = json.dumps(info).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            # compute the full response BEFORE sending any status, so an
            # error can still produce a clean 400 (and a client
            # disconnect mid-write cannot trigger a second status line)
            try:
                payload = json.loads(self.rfile.read(length))
                x = np.asarray(payload["x"], np.float32)
                if x.ndim == 2:
                    x = x[None]
                if batcher is not None:
                    y = batcher.submit(x)
                else:
                    with device_lock:
                        y = predictor.predict(x)
                status = 200
                body = json.dumps({"y": np.asarray(y).tolist()}).encode()
            except Exception as e:  # noqa: BLE001 - report to client
                status = 400
                body = json.dumps({"error": str(e)}).encode()
            try:
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; nothing sane to send

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"serving on http://{host}:{port}/predict", flush=True)
    server.serve_forever()
