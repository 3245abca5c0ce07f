"""Paired restoration datasets + augmentations.

Parity with reference basicsr/data: PairedImageDataset (lq/gt folder pairs),
paired random crop, flip/rotation augmentation (transforms.py), and the
dataset-enlarging sampler semantics (EnlargedSampler: iterate an enlarged
virtual epoch). LMDB roots (basicsr file_client.py:82-155 layout) work with
or without the lmdb package: ImageRoot prefers the real binding and falls
back to the pure-Python lmdb_lite reader.
"""
from __future__ import annotations

import os
import random
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image


def paired_random_crop(gt: np.ndarray, lq: np.ndarray, gt_patch: int, scale: int,
                       rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
    lq_patch = gt_patch // scale
    h, w = lq.shape[:2]
    top = rng.randrange(max(h - lq_patch, 0) + 1)
    left = rng.randrange(max(w - lq_patch, 0) + 1)
    lq_c = lq[top:top + lq_patch, left:left + lq_patch]
    gt_c = gt[top * scale:top * scale + gt_patch,
              left * scale:left * scale + gt_patch]
    return gt_c, lq_c


def paired_augment(gt: np.ndarray, lq: np.ndarray, hflip: bool, rot: bool,
                   rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
    """flip + transpose augmentation (reference transforms.augment)."""
    if hflip and rng.random() < 0.5:
        gt, lq = gt[:, ::-1], lq[:, ::-1]
    if rot and rng.random() < 0.5:
        gt, lq = gt[::-1], lq[::-1]
    if rot and rng.random() < 0.5:
        gt, lq = gt.transpose(1, 0, 2), lq.transpose(1, 0, 2)
    return gt, lq


class ImageRoot:
    """Folder or `.lmdb` image source with one (stems, load) interface.

    LMDB roots follow the basicsr layout (reference utils/lmdb_util.py /
    utils/file_client.py:82-155): encoded image bytes keyed by the filename
    stem, plus a meta_info.txt of "name.ext (h,w,c) level" lines. Reading
    prefers the real `lmdb` package when importable and falls back to the
    pure-Python lmdb_lite reader, so `.lmdb` roots work without the package.
    """

    def __init__(self, root: str):
        self.root = root
        self.is_lmdb = root.endswith(".lmdb")
        self._reader = None
        if not self.is_lmdb:
            names = sorted(os.listdir(root))
            self._by_stem = {}
            for n in names:
                stem = os.path.splitext(n)[0]
                if stem in self._by_stem:
                    raise ValueError(
                        f"{root}: files {self._by_stem[stem]!r} and {n!r} "
                        "share a stem — pairing by stem would be ambiguous")
                self._by_stem[stem] = n
            self.stems = sorted(self._by_stem)
            return
        meta = os.path.join(root, "meta_info.txt")
        self._reader = self._open(root)
        if os.path.exists(meta):
            with open(meta) as f:
                self.stems = [os.path.splitext(line.split(" ")[0])[0]
                              for line in f if line.strip()]
        else:
            self.stems = [k.decode() for k in self._reader_keys()]

    def name_of(self, stem: str) -> str:
        """Full member path: the actual filename for folders, the key path
        for lmdb roots (which store stems only)."""
        if not self.is_lmdb:
            return os.path.join(self.root, self._by_stem[stem])
        return os.path.join(self.root, stem)

    def close(self):
        if self._reader is not None:
            kind, r = self._reader
            r.close()
            self._reader = None

    @staticmethod
    def _open(root):
        try:
            import lmdb
            env = lmdb.open(root, readonly=True, lock=False, readahead=False,
                            meminit=False)
            return ("lmdb", env)
        except ImportError:
            from .lmdb_lite import LmdbReader
            return ("lite", LmdbReader(root))

    def _reader_keys(self):
        kind, r = self._reader
        if kind == "lmdb":
            with r.begin() as txn:
                return [k for k, _ in txn.cursor()]
        return list(r.keys())

    def load(self, stem: str) -> np.ndarray:
        """Image as float32 HWC RGB in [0, 1]."""
        if not self.is_lmdb:
            path = os.path.join(self.root, self._by_stem[stem])
            img = Image.open(path)
        else:
            kind, r = self._reader
            if kind == "lmdb":
                with r.begin() as txn:
                    buf = txn.get(stem.encode())
            else:
                buf = r.get(stem.encode())
            if buf is None:
                raise KeyError(f"{stem} not in {self.root}")
            import io as _io
            img = Image.open(_io.BytesIO(buf))
        return np.asarray(img.convert("RGB"), np.float32) / 255.0


class PairedImageDataset:
    """lq/gt pairs matched by filename stem; each root is a folder or a
    basicsr-layout `.lmdb` environment."""

    def __init__(self, dataroot_gt: str, dataroot_lq: str, gt_size: int = 256,
                 scale: int = 1, phase: str = "train", use_flip: bool = True,
                 use_rot: bool = True, seed: int = 0):
        self.gt_root = ImageRoot(dataroot_gt)
        self.lq_root = ImageRoot(dataroot_lq)
        self.stems = self.gt_root.stems
        self.gt_size = gt_size
        self.scale = scale
        self.phase = phase
        self.use_flip = use_flip
        self.use_rot = use_rot
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.stems)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        stem = self.stems[i]
        gt = self.gt_root.load(stem)
        lq = self.lq_root.load(stem)
        if self.phase == "train":
            gt, lq = paired_random_crop(gt, lq, self.gt_size, self.scale, self.rng)
            gt, lq = paired_augment(gt, lq, self.use_flip, self.use_rot, self.rng)
        return lq.copy(), gt.copy()

    def native_batch(self, indices, seed: int, dtype: str = "float32"):
        """C++ fast path (native/image_loader.cpp nlc_load_paired_batch):
        decode + paired crop + paired flip/rot for a whole batch on the
        thread pool, off the GIL — same semantics as __getitem__ (different
        RNG draws). Returns (lq, gt) stacks, or None when ineligible
        (eval phase, lmdb roots, toolchain absent) or when any member
        failed to decode natively (caller falls back to the PIL path)."""
        if self.phase != "train" or self.gt_root.is_lmdb \
                or self.lq_root.is_lmdb:
            return None
        from ..native import native_available, load_paired_batch
        if not native_available():
            return None
        lqp = [self.lq_root.name_of(self.stems[i]) for i in indices]
        gtp = [self.gt_root.name_of(self.stems[i]) for i in indices]
        lq, gt, ok = load_paired_batch(
            lqp, gtp, self.gt_size // self.scale, self.scale,
            self.use_flip, self.use_rot, seed, dtype=dtype)
        if not ok.all():
            return None
        return lq, gt


class SyntheticPairedDataset:
    """Smoke-mode pairs: gt random smooth image, lq = noisy version."""

    def __init__(self, size: int = 32, n: int = 32, noise: float = 0.1):
        self.size = size
        self.n = n
        self.noise = noise

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        base = rng.rand(4, 4, 3).astype(np.float32)
        gt = np.kron(base, np.ones((self.size // 4, self.size // 4, 1), np.float32))
        lq = np.clip(gt + rng.randn(*gt.shape).astype(np.float32) * self.noise, 0, 1)
        return lq, gt


def paired_loader(dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                  enlarge_ratio: int = 1, infinite: bool = False,
                  native: bool = True, native_dtype: str = "float32"
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """EnlargedSampler semantics: the virtual epoch is enlarge_ratio x the
    dataset (reference data_sampler.py). When the dataset exposes a
    `native_batch` fast path (C++ decode off the GIL — matters doubly on
    few-core hosts, where a Python decode thread contends with the training
    loop), batches go through it, falling back per-batch to the per-item
    Python path. native_dtype="uint8" ships raw pixel bytes (4x smaller
    host->device transfers; RestorationModel.train_step normalizes
    on-device); fallback batches are float32, which the step also
    accepts."""
    rng = np.random.RandomState(seed)
    nb = getattr(dataset, "native_batch", None) if native else None
    batch_seed = seed
    while True:
        idx = np.tile(np.arange(len(dataset)), enlarge_ratio)
        if shuffle:
            rng.shuffle(idx)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            take = [int(j) for j in idx[i:i + batch_size]]
            if nb is not None:
                batch_seed += len(take)  # fresh per-image crop/flip draws
                r = nb(take, batch_seed, native_dtype)
                if r is not None:
                    yield r
                    continue
            lqs, gts = zip(*(dataset[j] for j in take))
            yield np.stack(lqs), np.stack(gts)
        if not infinite:
            return


class SingleImageDataset:
    """lq-only inference dataset (reference data/single_image_dataset.py):
    yields (lq, path) pairs for demo/visualization runs with no ground truth."""

    def __init__(self, dataroot_lq: str):
        self.root = ImageRoot(dataroot_lq)

    def __len__(self):
        return len(self.root.stems)

    def __getitem__(self, i: int):
        stem = self.root.stems[i]
        return self.root.load(stem), self.root.name_of(stem)


class StereoPairedDataset:
    """Stereo SR pairs for NAFSSR (reference data/paired_image_SR_LR_dataset.py
    stereo mode): left/right views stacked channel-wise to 6 channels, matched
    lq/gt folders with <name>_L/<name>_R file pairs or per-sample dirs holding
    lr0/lr1 + hr0/hr1."""

    def __init__(self, dataroot_gt: str, dataroot_lq: str, gt_size: int = 64,
                 scale: int = 2, phase: str = "train", use_flip: bool = True,
                 use_rot: bool = False, seed: int = 0):
        names = sorted(os.listdir(dataroot_gt))
        self.pairs = []
        for n in names:
            if n.endswith("_L.png") or n.endswith("_L.jpg"):
                r = n.replace("_L.", "_R.")
                if r in names:
                    self.pairs.append((n, r))
        if not self.pairs:
            raise ValueError(f"no *_L/*_R stereo pairs under {dataroot_gt}")
        self.root_gt = dataroot_gt
        self.root_lq = dataroot_lq
        self.gt_size = gt_size
        self.scale = scale
        self.phase = phase
        self.use_flip = use_flip
        self.use_rot = use_rot
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.pairs)

    def _load(self, root, name):
        return np.asarray(Image.open(os.path.join(root, name)).convert("RGB"),
                          np.float32) / 255.0

    def __getitem__(self, i: int):
        ln, rn = self.pairs[i]
        gt = np.concatenate([self._load(self.root_gt, ln),
                             self._load(self.root_gt, rn)], axis=-1)
        lq = np.concatenate([self._load(self.root_lq, ln),
                             self._load(self.root_lq, rn)], axis=-1)
        if self.phase == "train":
            gt, lq = paired_random_crop(gt, lq, self.gt_size, self.scale,
                                        self.rng)
            gt, lq = paired_augment(gt, lq, self.use_flip, self.use_rot,
                                    self.rng)
        return lq.copy(), gt.copy()


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = "reflection"):
    """Frame window around crt_idx with boundary padding (reference
    basicsr/data/data_util.py:41-94; same four modes and semantics)."""
    assert num_frames % 2 == 1, "num_frames should be odd"
    assert padding in ("replicate", "reflection", "reflection_circle",
                       "circle"), padding
    last = max_frame_num - 1
    pad = num_frames // 2
    out = []
    for i in range(crt_idx - pad, crt_idx + pad + 1):
        if i < 0:
            j = {"replicate": 0, "reflection": -i,
                 "reflection_circle": crt_idx + pad - i,
                 "circle": num_frames + i}[padding]
        elif i > last:
            j = {"replicate": last, "reflection": last * 2 - i,
                 "reflection_circle": (crt_idx - pad) - (i - last),
                 "circle": i - num_frames}[padding]
        else:
            j = i
        out.append(j)
    return out


class VideoClipDataset:
    """Video test pairs (reference data/video_test_dataset.py semantics):
    per-clip folders of frames under dataroot_gt/dataroot_lq; each item is the
    center-frame gt plus a num_frame window of lq frames stacked channel-wise
    (the frame-window conditioning REDS/Vimeo models consume)."""

    def __init__(self, dataroot_gt: str, dataroot_lq: str, num_frame: int = 3,
                 padding: str = "reflection",
                 dataroot_flow: Optional[str] = None,
                 flow_max_val: float = 20.0, flow_denorm: bool = False):
        self.clips = sorted(d for d in os.listdir(dataroot_lq)
                            if os.path.isdir(os.path.join(dataroot_lq, d)))
        if not self.clips:
            raise ValueError(f"no clip folders under {dataroot_lq}")
        self.root_gt = dataroot_gt
        self.root_lq = dataroot_lq
        self.root_flow = dataroot_flow
        # REDS stores flows quantized to [-20, 20] px without the /width
        # normalization (reference reds_dataset.py:180-184)
        self.flow_max_val = flow_max_val
        self.flow_denorm = flow_denorm
        self.num_frame = num_frame
        self.padding = padding
        self.index = []          # (clip, frame_idx, n_frames_in_clip)
        self.frames = {}
        for c in self.clips:
            fs = sorted(os.listdir(os.path.join(dataroot_lq, c)))
            self.frames[c] = fs
            self.index += [(c, i, len(fs)) for i in range(len(fs))]

    def __len__(self):
        return len(self.index)

    def _load(self, root, clip, name):
        return np.asarray(Image.open(os.path.join(root, clip, name))
                          .convert("RGB"), np.float32) / 255.0

    def __getitem__(self, i):
        clip, idx, n = self.index[i]
        fs = self.frames[clip]
        window = generate_frame_indices(idx, n, self.num_frame, self.padding)
        lq = np.concatenate([self._load(self.root_lq, clip, fs[j])
                             for j in window], axis=-1)
        gt = self._load(self.root_gt, clip, fs[idx])
        if self.root_flow is None:
            return lq, gt
        return lq, gt, self._load_flows(clip, fs[idx])

    def _load_flows(self, clip, frame_file):
        """REDS-style quantized flow maps: `<frame>_p{i}.png` / `_n{i}.png`
        pairs around the center frame, dx/dy concatenated along axis 0
        (reference basicsr/data/reds_dataset.py:166-190). Returns a list of
        (h, w, 2) flows ordered [p_k..p_1, n_1..n_k]."""
        from .flow import flowread
        frame = os.path.splitext(frame_file)[0]
        half = self.num_frame // 2
        flows = []
        for tag in [f"_p{i}" for i in range(half, 0, -1)] + \
                   [f"_n{i}" for i in range(1, half + 1)]:
            path = os.path.join(self.root_flow, clip, f"{frame}{tag}.png")
            flows.append(flowread(path, quantize_pair=True,
                                  max_val=self.flow_max_val,
                                  denorm=self.flow_denorm))
        return flows
