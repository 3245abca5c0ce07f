"""HTTP inference server — production-serving surface (beyond parity).

Serves the NLC sampler and restoration pipeline over plain HTTP with a warm,
jitted model: the sampling scan is compiled once at startup for a fixed batch
size; requests are padded to it, so no request ever triggers a recompile.

Concurrent requests are coalesced: a dispatcher thread packs same-kind
requests (unconditional sampling, or restoration with the same
constraint+projection) arriving within a short window into the batch slots of
one device launch and scatters the rows back, so k concurrent 1-image
requests cost one batch instead of k. Per-sample seeding keeps every image
bit-identical no matter how requests are packed.

Endpoints:
  GET  /healthz                     -> JSON: model/config/batch info
  POST /sample?n=4&seed=0           -> JSON: {"images": [<b64 PNG>, ...]}
  POST /restore?constraint=sr_bicubic[&constraint_proj=svd][&seed=0]
       body: a PNG/JPEG image       -> restored PNG bytes
       The image is degraded with the named operator, then restored by
       constrained NLC sampling (the image_sample pipeline).

Usage:
  python -m nlc_tpu.cli.serve --config celeba_hq --method pred_denoise_base \
      --load_eps store/models/celeba_hq.ckpt --batch_size 4 --port 8787
"""
from __future__ import annotations

import base64
import collections
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

import jax.numpy as jnp


class _Work:
    __slots__ = ("rows", "payload", "event", "result", "error")

    def __init__(self, rows, payload):
        self.rows = rows
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None


class Coalescer:
    """Packs concurrent same-key requests into one fixed-batch device launch.

    submit() blocks the calling (HTTP worker) thread; a single dispatcher
    thread drains the queue for up to window_s after the first pending item,
    groups requests whose key matches (same compiled function) until the
    batch is full, executes once, and scatters result rows back. Mismatched
    keys are deferred, never dropped.
    """

    def __init__(self, batch: int, execute, window_s: float = 0.005):
        self.batch = batch
        self.execute = execute      # (key, [work...]) -> array (>= used rows)
        self.window = window_s
        self.q: "queue.Queue" = queue.Queue()
        self.pending: "collections.deque" = collections.deque()
        self.n_launches = 0
        self.n_requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, key, rows: int, payload):
        w = _Work(rows, payload)
        self.q.put((key, w))
        w.event.wait()
        if w.error is not None:
            raise w.error
        return w.result

    def _take(self, timeout):
        if self.pending:
            return self.pending.popleft()
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None

    def _loop(self):
        while True:
            first = self._take(timeout=None if not self.pending else 0)
            if first is None:
                continue
            key, w = first
            group = [w]
            used = w.rows
            deadline = time.monotonic() + self.window
            deferred = []
            while used < self.batch:
                item = self._take(max(0.0, deadline - time.monotonic()))
                if item is None:
                    break
                k2, w2 = item
                if k2 == key and used + w2.rows <= self.batch:
                    group.append(w2)
                    used += w2.rows
                else:
                    deferred.append(item)
            self.pending.extend(deferred)
            try:
                out = self.execute(key, group)
                ofs = 0
                for g in group:
                    g.result = out[ofs:ofs + g.rows]
                    ofs += g.rows
            except Exception as e:  # surface in every caller, keep serving
                for g in group:
                    g.error = e
            self.n_launches += 1
            self.n_requests += len(group)
            for g in group:
                g.event.set()


class NLCService:
    """Owns the models and the compiled sampling functions."""

    def __init__(self, args, config, coalesce_ms: float = 5.0):
        from .image_sample import build_models_and_params
        from ..engine import DenoiseConfig, build_denoise_fn, init_noise
        from ..engine.loops import set_norm_maxmin
        from ..sched import get_sampler

        self.args = args
        self.config = config
        self.res = config.data.image_size
        self.batch = args.batch_size
        bundle, params, svars, _ = build_models_and_params(args, config)
        self.params, self.svars = params, svars

        self.sampler = get_sampler(
            args.sampler, config.diffusion.num_diffusion_timesteps,
            args.num_timesteps, sigma_style=args.sigma_style,
            sampler_var=args.sampler_var, eta=args.eta,
            continuous_t=bool(args.continuous_t))
        nmin, nmax = set_norm_maxmin((self.res, self.res, 3),
                                     args.norm_min, args.norm_max)
        dcfg = DenoiseConfig(style=args.sigma_type, norm_eps=bool(args.norm_eps),
                             refine_prior_sigma=bool(args.refine_sigma),
                             clip_fn=args.clip_fn, norm_max=nmax, norm_min=nmin,
                             sigma_pred_threshold=args.sigma_pred_threshold)
        self._dcfg = dcfg
        self._bundle = bundle
        self._init_noise = init_noise
        self._build_denoise_fn = build_denoise_fn
        self._fns = {}
        self._cfs = {}
        self._lock = threading.Lock()   # jax dispatch is not re-entrancy-safe
        self.coalescer = Coalescer(self.batch, self._execute,
                                   window_s=coalesce_ms / 1000.0)
        # warm the unconditional path so the first request is fast
        self.sample(min(2, self.batch), seed=0)

    def _fn(self, key, constrain_fn=None):
        if key not in self._fns:
            self._fns[key] = self._build_denoise_fn(
                self.sampler, self._bundle, self._dcfg,
                constrain_fn=constrain_fn, donate_x=False)
        return self._fns[key]

    def sample(self, n: int, seed: int = 0) -> np.ndarray:
        """Blocks until the coalescer has run this request's rows. Every image
        is keyed by its own seed (per-sample RNG), so the result is identical
        no matter which other requests share the launch."""
        n = max(1, min(n, self.batch))
        return self.coalescer.submit(("uncond",), n,
                                     np.arange(seed, seed + n))

    def _pack_rows(self, arrays, pad_to: int):
        packed = np.concatenate(arrays, axis=0)
        if packed.shape[0] < pad_to:   # dead slots: repeat the last row
            reps = np.repeat(packed[-1:], pad_to - packed.shape[0], axis=0)
            packed = np.concatenate([packed, reps], axis=0)
        return packed

    def _execute(self, key, group) -> np.ndarray:
        """Dispatcher-thread entry: run one device launch for a packed group."""
        if key[0] == "uncond":
            seeds = jnp.asarray(self._pack_rows([g.payload for g in group],
                                                self.batch))
            with self._lock:
                xT = self._init_noise(self.sampler, seeds,
                                      (self.res, self.res, 3))
                out, _ = self._fn("uncond")(self.params, self.svars, xT, seeds)
                return np.asarray(out)
        _, constraint, proj = key
        cf = self._constraint(constraint, proj)
        x = jnp.asarray(self._pack_rows([g.payload["x"] for g in group],
                                        self.batch))
        y = cf.transform(x)
        seeds = jnp.asarray(self._pack_rows(
            [np.asarray([g.payload["seed"]]) for g in group], self.batch))
        fnkey = ("restore", constraint, proj)
        if fnkey not in self._fns:
            import jax

            def run(params, svars, xT, seeds, y):
                from ..engine.loops import denoise_loop
                fn = cf.make_constrain_fn(y)
                return denoise_loop(self.sampler, self._bundle, self._dcfg,
                                    params, svars, xT, seeds, constrain_fn=fn)
            self._fns[fnkey] = jax.jit(run)
        with self._lock:
            xT = self._init_noise(self.sampler, seeds, (self.res, self.res, 3))
            out, _ = self._fns[fnkey](self.params, self.svars, xT, seeds, y)
            return np.asarray(out)

    def _constraint(self, name: str, proj: str):
        key = (name, proj)
        if key not in self._cfs:
            from ..operators import get_constraint_function
            cf = get_constraint_function(
                name if name != "inpainting" else "inpainting_random",
                proj, image_size=self.res, channels=3,
                fn_scale=self.args.constraint_scale, seed=self.args.seed)
            cf.lr = 1.0 if proj in ("simple", "svd") \
                else self.args.constraint_lr
            self._cfs[key] = cf
        return self._cfs[key]

    def restore(self, img01: np.ndarray, constraint: str, proj: str = "svd",
                seed: int = 0) -> np.ndarray:
        """One batch slot per request; concurrent restorations with the same
        (constraint, proj) pack their measurements y row-wise into one launch."""
        x = img01[None].astype(np.float32) * 2.0 - 1.0
        out = self.coalescer.submit(("restore", constraint, proj), 1,
                                    {"x": x, "seed": seed})
        return out[0]


def _png_bytes(img01: np.ndarray) -> bytes:
    from ..utils.image_io import to_uint8
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(to_uint8(img01)).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(service: NLCService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                return self._json(200, {
                    "status": "ok", "config": service.args.config_path,
                    "resolution": service.res, "batch": service.batch,
                    "sigma_type": service.args.sigma_type,
                    "steps": service.args.num_timesteps,
                    "launches": service.coalescer.n_launches,
                    "requests": service.coalescer.n_requests})
            return self._json(404, {"error": "unknown path"})

        def do_POST(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == "/sample":
                    t0 = time.time()
                    imgs = service.sample(int(q.get("n", 1)),
                                          int(q.get("seed", 0)))
                    img01 = np.clip((imgs + 1) / 2, 0, 1)
                    return self._json(200, {
                        "images": [base64.b64encode(_png_bytes(im)).decode()
                                   for im in img01],
                        "time_s": round(time.time() - t0, 3)})
                if u.path == "/restore":
                    if "constraint" not in q:
                        return self._json(400, {"error": "constraint query "
                                                         "parameter required"})
                    n = int(self.headers.get("Content-Length", 0))
                    if n == 0:
                        return self._json(400, {"error": "image body required"})
                    from PIL import Image
                    img = Image.open(io.BytesIO(self.rfile.read(n))) \
                        .convert("RGB").resize((service.res, service.res))
                    img01 = np.asarray(img, np.float32) / 255.0
                    out = service.restore(img01, q["constraint"],
                                          q.get("constraint_proj", "svd"),
                                          int(q.get("seed", 0)))
                    body = _png_bytes(np.clip((out + 1) / 2, 0, 1))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                return self._json(404, {"error": "unknown path"})
            except Exception as e:   # report, don't kill the worker thread
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    from .image_sample import get_args
    import argparse
    outer = argparse.ArgumentParser(add_help=False)
    outer.add_argument("--port", type=int, default=8787)
    outer.add_argument("--host", type=str, default="127.0.0.1")
    outer.add_argument("--coalesce_ms", type=float, default=5.0,
                       help="wait window for packing concurrent requests "
                            "into one device batch")
    own, rest = outer.parse_known_args(argv)
    args, config = get_args(rest)
    from ..utils import logger
    logger.configure(dir="./logs/")
    service = NLCService(args, config, coalesce_ms=own.coalesce_ms)
    server = ThreadingHTTPServer((own.host, own.port), make_handler(service))
    logger.log(f"serving on http://{own.host}:{own.port} "
               f"(res {service.res}, batch {service.batch}, "
               f"{args.num_timesteps} steps)")
    server.serve_forever()


if __name__ == "__main__":
    main()
