"""KV metrics logger + wall-clock profiling scopes.

Behavior parity with the reference's OpenAI-baselines logger (src/logger.py):
  logkv / logkv_mean / dumpkvs        :212-245
  Human / JSON / CSV writers          :36-189
  profile_kv scope + @profile deco    :294-323 (accumulates wait_<name> times)
  configure(dir=...)                  :442

Plus TPU-native additions: a jax.profiler trace scope (start_trace/stop_trace)
for real device profiles, and block_until_ready fencing in profile_kv when
given jax arrays — wall-clock on TPU is meaningless without a fence.
"""
from __future__ import annotations

import contextlib
import csv
import datetime
import functools
import json
import os
import sys
import time
from collections import defaultdict
from typing import Any, Dict, Optional

DEBUG, INFO, WARN, ERROR, DISABLED = 10, 20, 30, 40, 50


class KVWriter:
    def writekvs(self, kvs: Dict[str, Any]) -> None:
        raise NotImplementedError

    def close(self):
        pass


class HumanOutputFormat(KVWriter):
    def __init__(self, file):
        self.file = file
        self.own = isinstance(file, str)
        if self.own:
            self.file = open(file, "a")

    def writekvs(self, kvs):
        key2str = {}
        for k, v in sorted(kvs.items()):
            valstr = f"{v:<8.3g}" if hasattr(v, "__float__") else str(v)
            key2str[self._trunc(k)] = self._trunc(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for k, v in sorted(key2str.items()):
            lines.append(f"| {k}{' ' * (keywidth - len(k))} | "
                         f"{v}{' ' * (valwidth - len(v))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _trunc(s, maxlen: int = 30):
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def close(self):
        if self.own:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "a")

    def writekvs(self, kvs):
        out = {k: float(v) if hasattr(v, "__float__") else v for k, v in kvs.items()}
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename):
        self.filename = filename
        self.keys: list = []
        self.file = open(filename, "a+")

    def writekvs(self, kvs):
        extra = sorted(set(kvs.keys()) - set(self.keys))
        if extra:
            self.keys.extend(extra)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.truncate()
            self.file.write(",".join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line.rstrip("\n") + "," * len(extra) + "\n")
        row = [str(kvs.get(k, "")) for k in self.keys]
        self.file.write(",".join(row) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


# ---- TensorBoard event files, dependency-free --------------------------
# The reference logger's TensorBoardOutputFormat (src/logger.py:160-189) uses
# tensorflow to write event files; neither tensorflow nor tensorboard is in
# this image, so the Event proto (wall_time/step/summary{tag, simple_value})
# and TFRecord framing (length + masked crc32c) are encoded by hand.

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _tb_event(wall_time: float, step: int, kvs: Dict[str, float]) -> bytes:
    import struct
    values = b""
    for tag, val in kvs.items():
        t = tag.encode()
        v = (b"\x0a" + _varint(len(t)) + t
             + b"\x15" + struct.pack("<f", float(val)))
        values += b"\x0a" + _varint(len(v)) + v
    event = (b"\x09" + struct.pack("<d", wall_time)
             + b"\x10" + _varint(step)
             + b"\x2a" + _varint(len(values)) + values)
    header = struct.pack("<Q", len(event))
    return (header + struct.pack("<I", _masked_crc(header))
            + event + struct.pack("<I", _masked_crc(event)))


class TensorBoardOutputFormat(KVWriter):
    """Scalar-only event-file writer readable by TensorBoard/XProf."""

    def __init__(self, ev_dir: str):
        os.makedirs(ev_dir, exist_ok=True)
        path = os.path.join(ev_dir, f"events.out.tfevents.{int(time.time())}.nlc")
        self.file = open(path, "ab")
        self.step = 0

    def writekvs(self, kvs):
        scalars = {k: float(v) for k, v in kvs.items()
                   if isinstance(v, (int, float)) and not isinstance(v, bool)}
        self.step = int(scalars.pop("epoch", scalars.pop("step", self.step + 1)))
        self.file.write(_tb_event(time.time(), self.step, scalars))
        self.file.flush()

    def close(self):
        self.file.close()


def make_output_format(fmt: str, ev_dir: str, suffix: str = "") -> KVWriter:
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(os.path.join(ev_dir, f"log{suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(ev_dir, f"progress{suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(ev_dir, f"progress{suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(os.path.join(ev_dir, f"tb{suffix}"))
    raise ValueError(f"unknown format {fmt!r}")


class Logger:
    CURRENT: Optional["Logger"] = None

    def __init__(self, dir: Optional[str], output_formats):
        self.name2val: Dict[str, Any] = defaultdict(float)
        self.name2cnt: Dict[str, int] = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        d = dict(self.name2val)
        for fmt in self.output_formats:
            fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return d

    def log(self, *args, level=INFO):
        if self.level <= level:
            print(*args, file=sys.stderr, flush=True)

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def configure(dir: Optional[str] = None, format_strs=None, suffix: str = "") -> Logger:
    if dir is None:
        dir = os.environ.get("NLC_LOGDIR") or os.path.join(
            "/tmp", "nlc-" + datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S-%f"))
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        format_strs = os.environ.get("NLC_LOG_FORMAT", "stdout,log,csv").split(",")
    output_formats = [make_output_format(f, dir, suffix) for f in format_strs if f]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    return Logger.CURRENT


def get_current() -> Logger:
    if Logger.CURRENT is None:
        configure(format_strs=["stdout"])
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kwargs):
    get_current().log(*args, **kwargs)


# ---- profiling ----

@contextlib.contextmanager
def profile_kv(scopename: str, fence: Any = None):
    """Accumulate wall-clock into wait_<scope>. Pass a jax array (or pytree)
    as `fence` to block_until_ready before stopping the clock."""
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        if fence is not None:
            import jax
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
                else x, fence)
        get_current().name2val[logkey] += time.time() - tstart


def profile(n: str):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)
        return wrapper
    return decorator


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Real device profile via jax.profiler (TensorBoard-viewable)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def init_tb_logger(log_dir: str) -> KVWriter:
    """BasicSR-surface tb hook (reference basicsr/utils/logger.py:91-97):
    returns the dependency-free event writer rooted at log_dir."""
    return make_output_format("tensorboard", log_dir)


def init_wandb_logger(opt) -> None:
    """BasicSR-surface wandb hook (reference basicsr/utils/logger.py:100-123,
    "only used to sync tensorboard"). This environment has no egress, so when
    the wandb package is absent the hook degrades to a logged no-op instead
    of failing the run; with wandb installed it mirrors the reference's
    resume-id semantics."""
    try:
        import wandb
    except ImportError:
        log("wandb requested but not installed; tensorboard events still "
            "written locally (no-egress environment)")
        return None
    wcfg = opt.get("logger", {}).get("wandb", {}) if isinstance(opt, dict) \
        else {}
    resume_id = wcfg.get("resume_id")
    wandb.init(id=resume_id or wandb.util.generate_id(),
               resume="allow" if resume_id else "never",
               name=opt.get("name"), config=opt,
               project=wcfg.get("project"), sync_tensorboard=True)
    return None
