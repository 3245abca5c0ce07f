"""Minimal pure-Python LMDB file reader/writer (no liblmdb dependency).

The reference's restoration pipelines distribute datasets as LMDB
environments (basicsr/utils/lmdb_util.py writes them; file_client.py:82-155
reads them), but the `lmdb` package is not available in every environment.
This module implements the on-disk format directly:

  * `LmdbReader` memory-maps `data.mdb`, picks the live meta page (larger
    txnid), and walks the main DB's B+tree: branch pages -> leaf pages ->
    node records, following BIGDATA overflow chains for large values. Keys
    are returned in sorted order, exactly as liblmdb's cursor would.
  * `LmdbWriter` builds a valid single-version environment bottom-up: leaf
    pages packed with sorted nodes (values above ~1/2 page go to overflow
    pages), branch levels up to a root, then the two meta pages. Files it
    writes are readable by the real liblmdb (standard page/node layout,
    magic 0xBEEFC0DE, version 1) and by LmdbReader.

Scope: read-only access and bulk creation — exactly what the dataset
pipelines need. No transactions, no named sub-databases, no DUPSORT (the
reference's image LMDBs use none of these). Byte order is little-endian
64-bit, the layout liblmdb produces on every platform this framework
targets. When the real `lmdb` package is importable the data pipeline
prefers it; this is the fallback that unblocks `.lmdb` roots without it.
"""
from __future__ import annotations

import mmap
import os
import struct
from typing import Iterator, List, Optional, Tuple

MAGIC = 0xBEEFC0DE
VERSION = 1
PAGEHDRSZ = 16

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20

F_BIGDATA = 0x01

# MDB_db: pad(4) flags(2) depth(2) branch(8) leaf(8) overflow(8) entries(8) root(8)
_DB_FMT = "<IHHQQQQQ"
_DB_SIZE = struct.calcsize(_DB_FMT)
# MDB_meta: magic(4) version(4) address(8) mapsize(8) dbs[2] last_pg(8) txnid(8)
_META_FMT = f"<II QQ {_DB_SIZE * 2}s QQ"


class _Db:
    __slots__ = ("pad", "flags", "depth", "branch_pages", "leaf_pages",
                 "overflow_pages", "entries", "root")

    def __init__(self, raw: bytes):
        (self.pad, self.flags, self.depth, self.branch_pages, self.leaf_pages,
         self.overflow_pages, self.entries, self.root) = struct.unpack(_DB_FMT, raw)


class LmdbReader:
    """Read-only access to an LMDB environment directory (or data.mdb path)."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        metas = []
        for pgno in (0, 1):
            m = self._read_meta(pgno)
            if m is not None:
                metas.append(m)
        if not metas:
            raise ValueError(f"{path}: not an LMDB file (bad magic/version)")
        txnid, psize, main = max(metas, key=lambda t: t[0])
        self.psize = psize
        self._main = main
        self.entries = main.entries

    def _read_meta(self, pgno: int):
        """Meta page = 16-byte page header + MDB_meta. Meta 0 sits at offset
        0 regardless of page size; its free-DB pad field records the real
        page size (liblmdb's mm_psize), which locates meta 1."""
        if pgno == 0:
            off = PAGEHDRSZ
        else:
            if not getattr(self, "_psize_hint", 0):
                return None
            off = self._psize_hint + PAGEHDRSZ
        raw = self._mm[off: off + struct.calcsize(_META_FMT)]
        if len(raw) < struct.calcsize(_META_FMT):
            return None
        magic, version, _addr, _mapsize, dbs_raw, _last_pg, txnid = \
            struct.unpack(_META_FMT, raw)
        if magic != MAGIC or version != VERSION:
            return None
        free_db = _Db(dbs_raw[:_DB_SIZE])
        main_db = _Db(dbs_raw[_DB_SIZE:])
        real_psize = free_db.pad or 4096
        if pgno == 0:
            self._psize_hint = real_psize
        return txnid, real_psize, main_db

    # ---- page walking ----

    def _page(self, pgno: int) -> Tuple[int, bytes]:
        off = pgno * self.psize
        hdr = self._mm[off: off + PAGEHDRSZ]
        flags = struct.unpack_from("<H", hdr, 10)[0]
        return flags, self._mm[off: off + self.psize]

    @staticmethod
    def _numkeys(page: bytes) -> int:
        lower = struct.unpack_from("<H", page, 12)[0]
        return (lower - PAGEHDRSZ) >> 1

    @staticmethod
    def _node(page: bytes, i: int):
        ptr = struct.unpack_from("<H", page, PAGEHDRSZ + 2 * i)[0]
        lo, hi, flags, ksize = struct.unpack_from("<HHHH", page, ptr)
        key = page[ptr + 8: ptr + 8 + ksize]
        return lo, hi, flags, key, ptr + 8 + ksize

    def _branch_child(self, page: bytes, i: int) -> int:
        lo, hi, flags, _, _ = self._node(page, i)
        return lo | (hi << 16) | (flags << 32)

    def _leaf_value(self, page: bytes, i: int) -> bytes:
        lo, hi, flags, _, doff = self._node(page, i)
        dsize = lo | (hi << 16)
        if flags & F_BIGDATA:
            ov_pgno = struct.unpack_from("<Q", page, doff)[0]
            off = ov_pgno * self.psize
            return bytes(self._mm[off + PAGEHDRSZ: off + PAGEHDRSZ + dsize])
        return bytes(page[doff: doff + dsize])

    def _leaf_of(self, key: bytes) -> Tuple[bytes, int, bool]:
        """Descend to the leaf that would hold `key`; return (page, index,
        exact_match)."""
        if self._main.root == 0xFFFFFFFFFFFFFFFF:
            return b"", -1, False
        flags, page = self._page(self._main.root)
        while flags & P_BRANCH:
            n = self._numkeys(page)
            child_i = 0
            for i in range(1, n):   # node 0's key is implicit lowest
                _, _, _, k, _ = self._node(page, i)
                if k <= key:
                    child_i = i
                else:
                    break
            flags, page = self._page(self._branch_child(page, child_i))
        if flags & P_LEAF2:
            raise NotImplementedError("DUPFIXED leaf2 pages (not used by the "
                                      "reference's image LMDBs)")
        n = self._numkeys(page)
        for i in range(n):
            _, _, _, k, _ = self._node(page, i)
            if k == key:
                return page, i, True
            if k > key:
                return page, i, False
        return page, n, False

    # ---- public API (mirrors what file_client/data pipelines use) ----

    def get(self, key: bytes) -> Optional[bytes]:
        page, i, ok = self._leaf_of(key)
        return self._leaf_value(page, i) if ok else None

    def keys(self) -> Iterator[bytes]:
        if self._main.root == 0xFFFFFFFFFFFFFFFF:
            return
        stack = [self._main.root]
        while stack:
            flags, page = self._page(stack.pop())
            n = self._numkeys(page)
            if flags & P_BRANCH:
                for i in reversed(range(n)):
                    stack.append(self._branch_child(page, i))
            else:
                for i in range(n):
                    _, _, _, k, _ = self._node(page, i)
                    yield k

    def __len__(self) -> int:
        return int(self.entries)

    def close(self):
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class LmdbWriter:
    """Create an LMDB environment from (key, value) pairs.

    Semantics match liblmdb's put(): duplicate keys overwrite (last wins),
    keys are capped at 511 bytes (MDB_MAXKEYSIZE). Values spill to a
    temporary file as they arrive and pages stream to data.mdb, so memory
    stays O(keys), not O(dataset) — large image corpora fit. Node records
    are 2-byte aligned (liblmdb's EVEN padding) so the real binding's
    pointer-cast reads stay aligned.

    File layout: [meta0][meta1][overflow chains][leaves][branches]; metas
    are written last via seek once the tree shape is known.

    Usage:
        with LmdbWriter("out.lmdb") as w:
            w.put(b"a", payload)
        # -> out.lmdb/data.mdb (+ empty lock.mdb for tool compatibility)
    """

    MAXKEYSIZE = 511   # liblmdb MDB_MAXKEYSIZE

    def __init__(self, path: str, psize: int = 4096):
        import tempfile
        self.path = path
        self.psize = psize
        self._index = {}                      # key -> (spill offset, size)
        self._spill = tempfile.TemporaryFile()

    def put(self, key: bytes, value: bytes):
        assert isinstance(key, (bytes, bytearray))
        key = bytes(key)
        if len(key) > self.MAXKEYSIZE:
            raise ValueError(f"key exceeds liblmdb's {self.MAXKEYSIZE}-byte "
                             f"limit: {len(key)}")
        off = self._spill.seek(0, 2)
        self._spill.write(value)
        self._index[key] = (off, len(value))  # last write wins, like mdb_put

    def _value(self, key: bytes) -> bytes:
        off, size = self._index[key]
        self._spill.seek(off)
        return self._spill.read(size)

    # ---- page assembly ----

    @staticmethod
    def _node_bytes(lo: int, hi: int, flags: int, key: bytes,
                    data: bytes) -> bytes:
        rec = struct.pack("<HHHH", lo, hi, flags, len(key)) + key + data
        return rec if len(rec) % 2 == 0 else rec + b"\0"   # liblmdb EVEN()

    def _emit_page(self, f, pgno: int, flags: int,
                   nodes: List[bytes]) -> None:
        body = bytearray(self.psize)
        lower = PAGEHDRSZ + 2 * len(nodes)
        upper = self.psize
        offsets = []
        for node in reversed(nodes):
            upper -= len(node)
            body[upper: upper + len(node)] = node
            offsets.append(upper)
        offsets.reverse()
        struct.pack_into("<QHHHH", body, 0, pgno, 0, flags, lower, upper)
        for i, off in enumerate(offsets):
            struct.pack_into("<H", body, PAGEHDRSZ + 2 * i, off)
        f.write(bytes(body))

    def _write(self):
        psize = self.psize
        keys = sorted(self._index)
        ov_threshold = psize // 2
        os.makedirs(self.path, exist_ok=True)
        f = open(os.path.join(self.path, "data.mdb"), "w+b")
        try:
            f.seek(2 * psize)
            next_pg = 2

            # overflow chains first (their pgnos go into the leaf nodes)
            ov_pgno = {}
            n_ov_pages = 0
            for k in keys:
                size = self._index[k][1]
                if size >= ov_threshold:
                    n_ov = (PAGEHDRSZ + size + psize - 1) // psize
                    chain = bytearray(n_ov * psize)
                    struct.pack_into("<QHHI", chain, 0, next_pg, 0,
                                     P_OVERFLOW, n_ov)
                    chain[PAGEHDRSZ: PAGEHDRSZ + size] = self._value(k)
                    f.write(bytes(chain))
                    ov_pgno[k] = next_pg
                    next_pg += n_ov
                    n_ov_pages += n_ov

            # leaves, streamed page by page
            leaf_pgnos: List[int] = []
            first_keys: List[bytes] = []
            cur: List[bytes] = []
            cur_used = PAGEHDRSZ
            cur_first: Optional[bytes] = None

            def flush_leaf():
                nonlocal cur, cur_used, cur_first, next_pg
                if not cur:
                    return
                self._emit_page(f, next_pg, P_LEAF, cur)
                leaf_pgnos.append(next_pg)
                first_keys.append(cur_first)
                next_pg += 1
                cur, cur_used, cur_first = [], PAGEHDRSZ, None

            for k in keys:
                size = self._index[k][1]
                lo, hi = size & 0xFFFF, (size >> 16) & 0xFFFF
                if k in ov_pgno:
                    node = self._node_bytes(lo, hi, F_BIGDATA, k,
                                            struct.pack("<Q", ov_pgno[k]))
                else:
                    node = self._node_bytes(lo, hi, 0, k, self._value(k))
                need = 2 + len(node)
                if cur and cur_used + need > psize:
                    flush_leaf()
                if PAGEHDRSZ + need > psize:
                    raise ValueError(f"record for key {k!r} exceeds one page")
                if cur_first is None:
                    cur_first = k
                cur.append(node)
                cur_used += need
            flush_leaf()

            # branch levels bottom-up (small; kept in memory)
            level_pgnos, level_keys = leaf_pgnos, first_keys
            n_branch = 0
            depth = 1 if keys else 0
            while len(level_pgnos) > 1:
                bnodes, bfirst, bpgnos = [], [], []
                pending_nodes: List[bytes] = []
                pending_keys: List[bytes] = []
                used = PAGEHDRSZ
                groups: List[Tuple[List[bytes], bytes]] = []
                for i, (pg, k) in enumerate(zip(level_pgnos, level_keys)):
                    key = b"" if i == 0 else k
                    node = self._node_bytes(pg & 0xFFFF, (pg >> 16) & 0xFFFF,
                                            (pg >> 32) & 0xFFFF, key, b"")
                    need = 2 + len(node)
                    if pending_nodes and used + need > psize:
                        groups.append((pending_nodes, pending_keys[0]))
                        pending_nodes, pending_keys, used = [], [], PAGEHDRSZ
                    pending_nodes.append(node)
                    pending_keys.append(k)
                    used += need
                groups.append((pending_nodes, pending_keys[0]))
                new_pgnos, new_keys = [], []
                for nodes, firstk in groups:
                    self._emit_page(f, next_pg, P_BRANCH, nodes)
                    new_pgnos.append(next_pg)
                    new_keys.append(firstk)
                    next_pg += 1
                    n_branch += 1
                level_pgnos, level_keys = new_pgnos, new_keys
                depth += 1
            root = level_pgnos[0] if keys else 0xFFFFFFFFFFFFFFFF
            last_pg = next_pg - 1

            # metas at pgno 0/1 (free DB empty; its pad records the page size)
            free_db = struct.pack(_DB_FMT, psize, 0, 0, 0, 0, 0, 0,
                                  0xFFFFFFFFFFFFFFFF)
            main_db = struct.pack(_DB_FMT, 0, 0, depth, n_branch,
                                  len(leaf_pgnos), n_ov_pages, len(keys), root)
            f.seek(0)
            for pgno, txnid in ((0, 0), (1, 1)):
                page = bytearray(psize)
                struct.pack_into("<QHHHH", page, 0, pgno, 0, P_META,
                                 PAGEHDRSZ, PAGEHDRSZ)
                meta = struct.pack(_META_FMT, MAGIC, VERSION, 0,
                                   psize * (last_pg + 2), free_db + main_db,
                                   last_pg, txnid)
                page[PAGEHDRSZ: PAGEHDRSZ + len(meta)] = meta
                f.write(bytes(page))
        finally:
            f.close()
            self._spill.close()
        open(os.path.join(self.path, "lock.mdb"), "wb").close()

    def close(self):
        self._write()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is None:
            self.close()
        else:
            self._spill.close()


def make_image_lmdb(img_folder: str, lmdb_path: str) -> int:
    """Folder of images -> basicsr-layout .lmdb (reference
    utils/lmdb_util.py / create_lmdb.py): encoded bytes keyed by filename
    stem + meta_info.txt of "name (h,w,c) level" lines. Returns the number
    of images written."""
    from PIL import Image as _Image

    assert lmdb_path.endswith(".lmdb"), lmdb_path
    names = sorted(n for n in os.listdir(img_folder)
                   if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
    lines = []
    with LmdbWriter(lmdb_path) as w:
        for name in names:
            path = os.path.join(img_folder, name)
            with open(path, "rb") as f:
                buf = f.read()
            with _Image.open(path) as im:
                wpx, hpx = im.size
                c = len(im.getbands())
            stem = os.path.splitext(name)[0]
            w.put(stem.encode(), buf)
            lines.append(f"{name} ({hpx},{wpx},{c}) 1")
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(names)
