"""Input pipeline: ImageFolder datasets with the reference's transforms.

Parity with the reference's torchvision pipelines (fix_train.py:299-415):
  train: RandomResizedCrop(224) + RandomHorizontalFlip
  eval : Resize(256) + CenterCrop(224)
  normalize: conditional -- the unnormalized mode keeps inputs in [0,1] for
  the fixed-point head (mean 0 / std 1), normalized mode uses ImageNet
  mean/std (fix_train.py:302-307).

Implemented on PIL + numpy with a threaded prefetch loader; the C++ decode/
resize fast path (csrc/) plugs in through the same Loader interface.  For
multi-host training each process takes a contiguous index shard, the analog
of DistributedSampler (fix_train.py:374-379).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Iterator, List, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".webp")


def sample_crop(w: int, h: int, rng: random.Random):
    """RandomResizedCrop sampling, torchvision semantics (scale [0.08, 1],
    log-uniform ratio [3/4, 4/3]).  Returns (y0, x0, ch, cw, flip)."""
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(0.08, 1.0)
        log_ratio = (np.log(3 / 4), np.log(4 / 3))
        ratio = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * ratio)))
        ch = int(round(np.sqrt(target_area / ratio)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            break
    else:  # center fallback
        s = min(w, h)
        y0, x0, ch, cw = (h - s) // 2, (w - s) // 2, s, s
    flip = rng.random() < 0.5
    return y0, x0, ch, cw, flip


def train_transform(
    img,
    rng: random.Random,
    size: int = 224,
    normalize: bool = False,
    fast_decode: bool = False,
):
    """RandomResizedCrop(size) + HFlip (shared sampling with the native
    path; PIL applies the crop/resize/flip here).

    fast_decode: JPEG decode at reduced scale (PIL draft mode -- the decoder
    skips DCT coefficients, a DALI-style speedup).  The crop box is sampled
    on the original geometry and rescaled to the drafted image, keeping at
    least 2x the target resolution so the final bilinear resize still
    low-passes; numerics are close to but not bit-identical with the exact
    pipeline (opt-in; defaults off for reference parity)."""
    w, h = img.size
    y0, x0, ch, cw, flip = sample_crop(w, h, rng)
    if fast_decode:
        # decode no smaller than 2x the crop target on the crop's short side
        denom = max(1, min(ch, cw) // (2 * size))
        if denom > 1:
            img.draft("RGB", (max(1, w // denom), max(1, h // denom)))
            sx, sy = img.size[0] / w, img.size[1] / h
            x0, y0 = int(round(x0 * sx)), int(round(y0 * sy))
            cw = max(1, min(int(round(cw * sx)), img.size[0] - x0))
            ch = max(1, min(int(round(ch * sy)), img.size[1] - y0))
    img = img.crop((x0, y0, x0 + cw, y0 + ch))
    img = img.resize((size, size), Image.BILINEAR)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return _to_array(img, normalize)


def eval_transform(
    img,
    size: int = 224,
    resize: int = 256,
    normalize: bool = False,
    fast_decode: bool = False,
):
    """Resize(shorter side -> resize) + CenterCrop(size)."""
    w, h = img.size
    if fast_decode:
        denom = max(1, min(w, h) // (2 * resize))
        if denom > 1:
            img.draft("RGB", (max(1, w // denom), max(1, h // denom)))
            w, h = img.size
    if w < h:
        nw, nh = resize, max(1, int(round(h * resize / w)))
    else:
        nw, nh = max(1, int(round(w * resize / h))), resize
    img = img.resize((nw, nh), Image.BILINEAR)
    x0, y0 = (nw - size) // 2, (nh - size) // 2
    img = img.crop((x0, y0, x0 + size, y0 + size))
    return _to_array(img, normalize)


def _to_array(img, normalize: bool) -> np.ndarray:
    a = np.asarray(img.convert("RGB"), np.float32) / 255.0  # HWC in [0,1]
    if normalize:
        a = (a - IMAGENET_MEAN) / IMAGENET_STD
    return a


class ImageFolderDataset:
    """class-per-subdirectory layout, like torchvision ImageFolder."""

    def __init__(self, root: str):
        self.root = root
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(_EXTS):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int):
        path, label = self.samples[idx]
        return Image.open(path), label

    def load_bytes(self, idx: int) -> Tuple[bytes, int]:
        """Raw file bytes (the native JPEG decode path reads these)."""
        path, label = self.samples[idx]
        with open(path, "rb") as f:
            return f.read(), label


class SyntheticDataset:
    """Deterministic random images; for tests and throughput benches."""

    def __init__(self, n: int = 256, size: int = 224, classes: int = 1000, seed: int = 0):
        self.n, self.size, self.classes, self.seed = n, size, classes, seed

    def __len__(self):
        return self.n

    def load(self, idx: int):
        rng = np.random.RandomState(self.seed + idx)
        arr = rng.randint(0, 256, (self.size, self.size, 3), np.uint8)
        return Image.fromarray(arr), int(rng.randint(self.classes))


class Loader:
    """Threaded prefetch loader yielding (images NHWC float32, labels int32).

    shard/num_shards implement per-host data sharding; seed+epoch drive the
    shuffle so all hosts agree on the permutation (the sampler.set_epoch
    pattern, fix_train.py:743).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        train: bool = True,
        normalize: bool = False,
        image_size: int = 224,
        shard: int = 0,
        num_shards: int = 1,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = False,
        fast_decode: bool = False,
        decode_threads: int = 0,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.train = train
        self.normalize = normalize
        self.image_size = image_size
        self.shard = shard
        self.num_shards = num_shards
        self.workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.fast_decode = fast_decode
        # native JPEG decode threads per worker: the decode is GIL-free, so
        # workers x decode_threads should about cover the cores (not each
        # worker grabbing all of them)
        self.decode_threads = decode_threads or max(
            1, (os.cpu_count() or 4) // self.workers
        )
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self._indices())
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _indices(self) -> Sequence[int]:
        idx = np.arange(len(self.ds))
        if self.train:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard :: self.num_shards]

    def _load_one(self, i: int, rng: random.Random):
        img, label = self.ds.load(i)
        if self.train:
            a = train_transform(
                img, rng, self.image_size, self.normalize,
                fast_decode=self.fast_decode,
            )
        else:
            # shorter-side resize scales with crop size (256 for the
            # reference's 224 crops)
            a = eval_transform(
                img,
                self.image_size,
                resize=int(self.image_size * 256 / 224),
                normalize=self.normalize,
                fast_decode=self.fast_decode,
            )
        return a, label

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        indices = list(self._indices())
        if self.drop_last:
            indices = indices[: len(indices) // self.bs * self.bs]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.workers * 2)
        batches = [indices[i : i + self.bs] for i in range(0, len(indices), self.bs)]

        use_native = False
        use_jpeg = False
        try:
            from ..native import imageops_available, jpeg_available

            use_native = imageops_available()
            # native JPEG decode: the GIL-free decode path (the Python
            # decode is the loader bottleneck -- scripts/loader_bench.py);
            # F8NET_PY_DECODE=1 forces the PIL decode for A/B
            use_jpeg = (
                use_native
                and jpeg_available()
                and hasattr(self.ds, "load_bytes")
                and os.environ.get("F8NET_PY_DECODE") != "1"
            )
        except Exception:
            use_native = False

        def _po2_denom(d: int) -> int:
            # largest power of two <= d, capped at 8 (libjpeg scaled decode)
            return 1 << min(3, max(0, int(d).bit_length() - 1))

        def _jpeg_raws(batch, labels, rng):
            """Decode a batch natively (threads, GIL released); returns raws
            plus (boxes, flips) for training.  Per-image fallback to PIL for
            anything the native decoder rejects."""
            from ..native import c_decode_jpeg_batch, c_jpeg_dims_batch

            blobs = []
            for j, i in enumerate(batch):
                b, labels[j] = self.ds.load_bytes(int(i))
                blobs.append(b)
            dims = c_jpeg_dims_batch(blobs)
            denoms, boxes, flips = [], [], []
            resize_target = int(self.image_size * 256 / 224)
            for j, (w0, h0, ok) in enumerate(dims):
                if not ok:  # PIL knows the true size
                    w0, h0 = self.ds.load(int(batch[j]))[0].size
                if self.train:
                    y0, x0, ch, cw, fl = sample_crop(w0, h0, rng)
                    boxes.append((y0, x0, ch, cw, w0, h0))
                    flips.append(1 if fl else 0)
                    d = max(1, min(ch, cw) // (2 * self.image_size)) if self.fast_decode else 1
                else:
                    d = max(1, min(w0, h0) // (2 * resize_target)) if self.fast_decode else 1
                denoms.append(_po2_denom(d))
            # exact-decode (all denoms 1): the dims we already parsed match
            # the decode's output dims, so skip the second header pass
            reuse = dims if all(d == 1 for d in denoms) else None
            outs = c_decode_jpeg_batch(
                blobs, denoms, num_threads=self.decode_threads, dims=reuse
            )
            raws, out_boxes = [], []
            for j, arr in enumerate(outs):
                if arr is None:  # fallback: PIL decode (+draft when fast)
                    img, _ = self.ds.load(int(batch[j]))
                    if self.fast_decode and denoms[j] > 1:
                        img.draft(
                            "RGB",
                            (img.size[0] // denoms[j], img.size[1] // denoms[j]),
                        )
                    arr = np.asarray(img.convert("RGB"), np.uint8)
                raws.append(arr)
                if self.train:
                    y0, x0, ch, cw, w0, h0 = boxes[j]
                    if arr.shape[1] != w0 or arr.shape[0] != h0:
                        sx = arr.shape[1] / w0
                        sy = arr.shape[0] / h0
                        x0, y0 = int(round(x0 * sx)), int(round(y0 * sy))
                        cw = max(1, min(int(round(cw * sx)), arr.shape[1] - x0))
                        ch = max(1, min(int(round(ch * sy)), arr.shape[0] - y0))
                    out_boxes.append((y0, x0, ch, cw))
            return raws, out_boxes, flips

        def worker(worker_id: int):
            rng = random.Random(self.seed * 1000003 + self.epoch * 97 + worker_id)
            for bi in range(worker_id, len(batches), self.workers):
                batch = batches[bi]
                labels = np.empty((len(batch),), np.int32)
                if use_native and not self.train:
                    # C++ fast path: native JPEG decode when available (GIL
                    # released across decode threads), then batched
                    # antialiased resize + center-crop + normalize
                    from ..native import c_eval_preprocess_batch

                    if use_jpeg:
                        raws, _, _ = _jpeg_raws(batch, labels, rng)
                    else:
                        raws = []
                        resize_target = int(self.image_size * 256 / 224)
                        for j, i in enumerate(batch):
                            img, labels[j] = self.ds.load(int(i))
                            if self.fast_decode:
                                w0, h0 = img.size
                                denom = max(1, min(w0, h0) // (2 * resize_target))
                                if denom > 1:
                                    img.draft("RGB", (w0 // denom, h0 // denom))
                            raws.append(np.asarray(img.convert("RGB"), np.uint8))
                    imgs = c_eval_preprocess_batch(
                        raws,
                        resize=int(self.image_size * 256 / 224),
                        size=self.image_size,
                        mean=IMAGENET_MEAN if self.normalize else None,
                        std=IMAGENET_STD if self.normalize else None,
                        num_threads=2,
                    )
                elif use_native:
                    # C++ train fast path: python samples the crops (same RNG
                    # stream as the PIL path), C++ decodes (when JPEG) and
                    # does crop/resize/flip
                    from ..native import c_train_preprocess_batch

                    if use_jpeg:
                        raws, boxes, flips = _jpeg_raws(batch, labels, rng)
                    else:
                        raws, boxes, flips = [], [], []
                        for j, i in enumerate(batch):
                            img, labels[j] = self.ds.load(int(i))
                            w0, h0 = img.size
                            y0, x0, ch, cw, fl = sample_crop(w0, h0, rng)
                            if self.fast_decode:
                                denom = max(1, min(ch, cw) // (2 * self.image_size))
                                if denom > 1:
                                    img.draft("RGB", (w0 // denom, h0 // denom))
                                    sx = img.size[0] / w0
                                    sy = img.size[1] / h0
                                    x0, y0 = int(round(x0 * sx)), int(round(y0 * sy))
                                    cw = max(1, min(int(round(cw * sx)), img.size[0] - x0))
                                    ch = max(1, min(int(round(ch * sy)), img.size[1] - y0))
                            arr = np.asarray(img.convert("RGB"), np.uint8)
                            raws.append(arr)
                            boxes.append((y0, x0, ch, cw))
                            flips.append(1 if fl else 0)
                    imgs = c_train_preprocess_batch(
                        raws, np.asarray(boxes, np.int32),
                        np.asarray(flips, np.uint8), self.image_size,
                        mean=IMAGENET_MEAN if self.normalize else None,
                        std=IMAGENET_STD if self.normalize else None,
                        num_threads=2,
                    )
                else:
                    imgs = np.empty(
                        (len(batch), self.image_size, self.image_size, 3), np.float32
                    )
                    for j, i in enumerate(batch):
                        imgs[j], labels[j] = self._load_one(int(i), rng)
                out_q.put((bi, imgs, labels))
            out_q.put((None, worker_id, None))

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.workers)
        ]
        for t in threads:
            t.start()
        done = 0
        pending = {}
        next_bi = 0
        while done < self.workers or pending or next_bi < len(batches):
            bi, imgs, labels = out_q.get()
            if bi is None:
                done += 1
                if done == self.workers and next_bi >= len(batches):
                    break
                continue
            pending[bi] = (imgs, labels)
            while next_bi in pending:
                yield pending.pop(next_bi)
                next_bi += 1
        for t in threads:
            t.join(timeout=1.0)
