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
    """Create an LMDB environment from sorted or unsorted (key, value) pairs.

    Usage:
        with LmdbWriter("out.lmdb") as w:
            w.put(b"a", payload)
        # -> out.lmdb/data.mdb (+ empty lock.mdb for tool compatibility)
    """

    def __init__(self, path: str, psize: int = 4096):
        self.path = path
        self.psize = psize
        self._items: List[Tuple[bytes, bytes]] = []

    def put(self, key: bytes, value: bytes):
        assert isinstance(key, (bytes, bytearray))
        assert len(key) <= self.psize // 8, "key too large"
        self._items.append((bytes(key), bytes(value)))

    # ---- page assembly ----

    def _node_bytes(self, lo: int, hi: int, flags: int, key: bytes,
                    data: bytes) -> bytes:
        return struct.pack("<HHHH", lo, hi, flags, len(key)) + key + data

    def _pack_pages(self, nodes: List[bytes], flags: int) -> List[bytes]:
        """Pack node records into pages (ptrs grow from the front, nodes from
        the back, liblmdb layout)."""
        pages: List[List[bytes]] = [[]]
        used = [PAGEHDRSZ]
        for node in nodes:
            need = 2 + len(node)          # ptr slot + record
            if used[-1] + need > self.psize:
                pages.append([])
                used.append(PAGEHDRSZ)
            pages[-1].append(node)
            used[-1] += need
        out = []
        for plist in pages:
            lower = PAGEHDRSZ + 2 * len(plist)
            offsets = []
            upper = self.psize
            body = bytearray(self.psize)
            for node in reversed(plist):
                upper -= len(node)
                body[upper: upper + len(node)] = node
                offsets.append(upper)
            offsets.reverse()
            struct.pack_into("<QHHHH", body, 0, 0, 0, flags, lower, upper)
            for i, off in enumerate(offsets):
                struct.pack_into("<H", body, PAGEHDRSZ + 2 * i, off)
            out.append(bytes(body))
        return out

    def _write(self):
        items = sorted(self._items)
        psize = self.psize
        overflow_threshold = psize // 2

        # leaf node records; values above half a page go to overflow chains
        # (placeholder pgno patched once page numbers are known)
        ov_assignments: List[int] = []
        raw_nodes = []
        for idx, (key, val) in enumerate(items):
            dsize = len(val)
            lo, hi = dsize & 0xFFFF, (dsize >> 16) & 0xFFFF
            if dsize >= overflow_threshold:
                raw_nodes.append(self._node_bytes(lo, hi, F_BIGDATA, key,
                                                  b"\0" * 8))
                ov_assignments.append(idx)
            else:
                raw_nodes.append(self._node_bytes(lo, hi, 0, key, val))

        leaf_pages = self._pack_pages(raw_nodes, P_LEAF) if items else []

        # lay out: metas (0,1), leaves, branches, overflow chains at the end
        leaf_pgnos = list(range(2, 2 + len(leaf_pages)))
        next_pg = 2 + len(leaf_pages)

        # branch levels
        level_pgnos = leaf_pgnos
        level_first_keys = []
        # first key of each leaf page
        ki = 0
        for lp in leaf_pages:
            nk = LmdbReader._numkeys(lp)
            level_first_keys.append(items[ki][0])
            ki += nk
        branch_levels: List[List[bytes]] = []
        while len(level_pgnos) > 1:
            bnodes = []
            for i, (pg, k) in enumerate(zip(level_pgnos, level_first_keys)):
                key = b"" if i == 0 else k
                bnodes.append(self._node_bytes(pg & 0xFFFF, (pg >> 16) & 0xFFFF,
                                               (pg >> 32) & 0xFFFF, key, b""))
            bpages = self._pack_pages(bnodes, P_BRANCH)
            # fix child distribution: recompute first keys per branch page
            new_first, idx = [], 0
            for bp in bpages:
                new_first.append(level_first_keys[idx])
                idx += LmdbReader._numkeys(bp)
            branch_levels.append(bpages)
            level_pgnos = list(range(next_pg, next_pg + len(bpages)))
            next_pg += len(bpages)
            level_first_keys = new_first
        root = level_pgnos[0] if items else 0xFFFFFFFFFFFFFFFF

        # overflow chains + patch BIGDATA node pointers inside leaf pages
        patched_leaves = [bytearray(lp) for lp in leaf_pages]
        ov_pages: List[bytes] = []
        if ov_assignments:
            # map node index -> (leaf page #, slot) by walking leaves
            slot_of = {}
            idx = 0
            for li, lp in enumerate(leaf_pages):
                for s in range(LmdbReader._numkeys(lp)):
                    slot_of[idx] = (li, s)
                    idx += 1
            for node_idx in ov_assignments:
                key, val = items[node_idx]
                # liblmdb stores overflow data contiguously after ONE header
                n_ov = (PAGEHDRSZ + len(val) + psize - 1) // psize
                chain = bytearray(n_ov * psize)
                struct.pack_into("<QHHI", chain, 0, next_pg, 0, P_OVERFLOW, n_ov)
                chain[PAGEHDRSZ: PAGEHDRSZ + len(val)] = val
                li, s = slot_of[node_idx]
                page = patched_leaves[li]
                ptr = struct.unpack_from("<H", page, PAGEHDRSZ + 2 * s)[0]
                ksize = struct.unpack_from("<H", page, ptr + 6)[0]
                struct.pack_into("<Q", page, ptr + 8 + ksize, next_pg)
                for c in range(n_ov):
                    ov_pages.append(bytes(chain[c * psize:(c + 1) * psize]))
                next_pg += n_ov

        tree_pages = [bytes(p) for p in patched_leaves]
        for lvl in branch_levels:
            tree_pages.extend(lvl)
        # stamp real page numbers into the tree-page headers; overflow chains
        # already carry theirs and their continuation pages are raw data
        body_pages = []
        for i, p in enumerate(tree_pages):
            b = bytearray(p)
            struct.pack_into("<Q", b, 0, 2 + i)
            body_pages.append(bytes(b))
        body_pages.extend(ov_pages)
        last_pg = 1 + len(body_pages)

        # meta pages: free DB empty; main DB describes the tree
        depth = 1 + len(branch_levels) if items else 0
        n_branch = sum(len(l) for l in branch_levels)
        free_db = struct.pack(_DB_FMT, psize, 0, 0, 0, 0, 0, 0,
                              0xFFFFFFFFFFFFFFFF)
        main_db = struct.pack(_DB_FMT, 0, 0, depth, n_branch, len(leaf_pages),
                              len(ov_pages), len(items), root)
        metas = []
        for pgno, txnid in ((0, 0), (1, 1)):
            page = bytearray(psize)
            struct.pack_into("<QHHHH", page, 0, pgno, 0, P_META,
                             PAGEHDRSZ, PAGEHDRSZ)
            meta = struct.pack(_META_FMT, MAGIC, VERSION, 0,
                               psize * (last_pg + 1), free_db + main_db,
                               last_pg, txnid)
            page[PAGEHDRSZ: PAGEHDRSZ + len(meta)] = meta
            metas.append(bytes(page))

        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "data.mdb"), "wb") as f:
            f.write(metas[0])
            f.write(metas[1])
            for p in body_pages:
                f.write(p)
        open(os.path.join(self.path, "lock.mdb"), "wb").close()

    def close(self):
        self._write()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is None:
            self.close()


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
