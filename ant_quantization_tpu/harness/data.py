"""Data pipelines for the workload harnesses.

TPU-native replacements of the reference's three input stacks:
- DALI GPU ImageNet pipeline (ant ImageNet/dataloader.py:90-197) -> a
  host-side PIL/numpy folder pipeline producing NHWC float batches, sharded
  per JAX process (decode on host, compute on TPU; TPUs have no on-device
  decode, so the host pipeline feeds a prefetch queue).
- GLUE TSV processors (ant BERT/processors/glue.py:127-781) -> tsv/json
  readers per task with identical text_a/text_b/label column conventions.
- HF datasets group_texts chunking (olive llm/run_clm.py:521-535) ->
  ``lm_blocks``: concatenate token streams, drop the remainder, split into
  block_size chunks.

Everything yields plain numpy; device placement/sharding happens in the
harness loop.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "lm_blocks", "batched", "TextDataset",
    "GLUE_TASKS", "GlueExample", "load_glue_split", "glue_num_labels",
    "IMAGENET_MEAN", "IMAGENET_STD", "model_input_size",
    "list_imagefolder", "load_image", "imagefolder_batches",
    "synthetic_image_batches", "prefetched", "load_image_u8",
    "normalize_images",
]


# ---------------------------------------------------------------------------
# Causal-LM chunking (run_clm.py group_texts semantics)
# ---------------------------------------------------------------------------

def lm_blocks(token_ids: Sequence[int], block_size: int) -> np.ndarray:
    """Concatenate tokens, drop the tail remainder, reshape to
    (n_blocks, block_size) — exactly HF group_texts (run_clm.py:521-535)."""
    ids = np.asarray(token_ids, np.int32)
    n = (len(ids) // block_size) * block_size
    return ids[:n].reshape(-1, block_size)


def batched(array: np.ndarray, batch_size: int,
            drop_remainder: bool = False) -> Iterator[np.ndarray]:
    n = len(array)
    stop = n - (n % batch_size) if drop_remainder else n
    for i in range(0, stop, batch_size):
        yield array[i:i + batch_size]


class TextDataset:
    """Tokenized text corpus -> LM eval blocks.

    Sources, in priority order:
    - a plain text file (one document; tokenized whole)
    - a local HF dataset directory via ``datasets.load_from_disk``
    - the HF hub (requires network; gated behind availability)
    """

    def __init__(self, tokens: np.ndarray, block_size: int):
        self.blocks = lm_blocks(tokens, block_size)

    @classmethod
    def from_text_file(cls, path: str, tokenizer, block_size: int,
                       max_chars: Optional[int] = None) -> "TextDataset":
        with open(path, "r", encoding="utf-8") as f:
            text = f.read(max_chars) if max_chars else f.read()
        return cls(np.asarray(tokenizer(text)["input_ids"], np.int32),
                   block_size)

    @classmethod
    def from_hf(cls, name: str, config: Optional[str], split: str,
                tokenizer, block_size: int,
                text_column: str = "text") -> "TextDataset":
        import datasets  # local availability checked by caller
        if os.path.isdir(name):
            ds = datasets.load_from_disk(name)
            if split in getattr(ds, "keys", lambda: [])():
                ds = ds[split]
        else:
            ds = datasets.load_dataset(name, config, split=split)
        ids: List[int] = []
        for rec in ds:
            t = rec[text_column]
            if t:
                ids.extend(tokenizer(t)["input_ids"])
        return cls(np.asarray(ids, np.int32), block_size)


# ---------------------------------------------------------------------------
# GLUE (reference processors: ant BERT/processors/glue.py)
# ---------------------------------------------------------------------------

class GlueExample:
    __slots__ = ("text_a", "text_b", "label")

    def __init__(self, text_a: str, text_b: Optional[str], label):
        self.text_a = text_a
        self.text_b = text_b
        self.label = label


# task -> (labels, dev filename, columns of (text_a, text_b, label) in the
# dev TSV). Column conventions follow the reference's per-task processors
# (BERT/processors/glue.py:127-781) on the standard GLUE data layout.
GLUE_TASKS: Dict[str, dict] = {
    "cola": {"labels": ["0", "1"], "dev": "dev.tsv",
             "cols": (3, None, 1), "header": False},
    "sst2": {"labels": ["0", "1"], "dev": "dev.tsv",
             "cols": (0, None, 1), "header": True},
    "mrpc": {"labels": ["0", "1"], "dev": "dev.tsv",
             "cols": (3, 4, 0), "header": True},
    "qqp": {"labels": ["0", "1"], "dev": "dev.tsv",
            "cols": (3, 4, 5), "header": True},
    "mnli": {"labels": ["contradiction", "entailment", "neutral"],
             "dev": "dev_matched.tsv", "cols": (8, 9, -1), "header": True},
    "mnli-mm": {"labels": ["contradiction", "entailment", "neutral"],
                "dev": "dev_mismatched.tsv", "cols": (8, 9, -1),
                "header": True},
    "qnli": {"labels": ["entailment", "not_entailment"], "dev": "dev.tsv",
             "cols": (1, 2, -1), "header": True},
    "rte": {"labels": ["entailment", "not_entailment"], "dev": "dev.tsv",
            "cols": (1, 2, -1), "header": True},
    "wnli": {"labels": ["0", "1"], "dev": "dev.tsv",
             "cols": (1, 2, -1), "header": True},
    "stsb": {"labels": None, "dev": "dev.tsv",
             "cols": (7, 8, -1), "header": True},
}


def glue_num_labels(task: str) -> int:
    labels = GLUE_TASKS[task.lower()]["labels"]
    return 1 if labels is None else len(labels)


def _read_tsv(path: str) -> List[List[str]]:
    with open(path, "r", encoding="utf-8") as f:
        return list(csv.reader(f, delimiter="\t", quotechar=None))


def load_glue_split(data_dir: str, task: str,
                    split: str = "dev") -> List[GlueExample]:
    """Read a GLUE split from the standard TSV layout, or from a
    jsonl file with {"sentence1"/"sentence2"/"label"} records."""
    task = task.lower()
    info = GLUE_TASKS[task]
    jsonl = os.path.join(data_dir, f"{split}.jsonl")
    if os.path.exists(jsonl):
        out = []
        with open(jsonl, "r", encoding="utf-8") as f:
            for line in f:
                r = json.loads(line)
                out.append(GlueExample(
                    r.get("sentence1") or r.get("sentence") or r["text_a"],
                    r.get("sentence2") or r.get("text_b"),
                    r["label"]))
        return _encode_labels(out, info)
    fname = info["dev"] if split == "dev" else f"{split}.tsv"
    rows = _read_tsv(os.path.join(data_dir, fname))
    if info["header"]:
        rows = rows[1:]
    ca, cb, cl = info["cols"]
    out = []
    for row in rows:
        if len(row) <= max(ca, cb or 0, cl if cl >= 0 else 0):
            continue
        out.append(GlueExample(row[ca], row[cb] if cb is not None else None,
                               row[cl]))
    return _encode_labels(out, info)


def _encode_labels(examples: List[GlueExample], info: dict):
    labels = info["labels"]
    for e in examples:
        if labels is None:
            e.label = float(e.label)
        elif not isinstance(e.label, int):
            e.label = labels.index(str(e.label))
    return examples


def encode_glue_batch(tokenizer, examples: Sequence[GlueExample],
                      max_length: int) -> Dict[str, np.ndarray]:
    enc = tokenizer(
        [e.text_a for e in examples],
        [e.text_b for e in examples] if examples[0].text_b is not None
        else None,
        padding="max_length", truncation=True, max_length=max_length)
    batch = {k: np.asarray(v, np.int32) for k, v in enc.items()}
    batch["labels"] = np.asarray([e.label for e in examples])
    return batch


# ---------------------------------------------------------------------------
# ImageNet folder pipeline (replaces the DALI GPU pipeline)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def model_input_size(model_name: str) -> Tuple[int, int]:
    """(resize, crop) per model — mirrors the DALI loader's model-specific
    sizes (ant ImageNet/dataloader.py:143-153)."""
    name = model_name.lower()
    if "inception" in name:
        return 342, 299
    return 256, 224


def list_imagefolder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """ImageFolder layout: root/<class>/<img>. Classes sorted by name (the
    torchvision convention, so labels match torchvision checkpoints)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for i, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(
                    (".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                paths.append(os.path.join(cdir, fname))
                labels.append(i)
    return paths, labels, classes


def load_image_u8(path: str, resize: int, crop: int) -> np.ndarray:
    """Decode transform only: shorter-side resize -> center crop. Returns
    HWC uint8 — normalization belongs on the accelerator (the DALI
    pipeline's split: host decodes, device normalizes), which keeps the
    host loop GIL-light (PIL's decode/resize release the GIL; the f32
    normalize does not) and the host->device transfer 4x smaller."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = resize, int(round(h * resize / w))
    else:
        nw, nh = int(round(w * resize / h)), resize
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - crop) // 2
    top = (nh - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, np.uint8)


def normalize_images(x):
    """(B, H, W, C) uint8 -> normalized f32; jnp-traceable, so it can run
    inside the jitted train/eval step (on-device normalization)."""
    import jax.numpy as jnp
    return ((x.astype(jnp.float32) / 255.0
             - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD))


def load_image(path: str, resize: int, crop: int) -> np.ndarray:
    """Eval transform: shorter-side resize -> center crop -> normalize.
    Returns HWC float32."""
    x = load_image_u8(path, resize, crop).astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def prefetched(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread with a bounded queue so the
    consumer (the accelerator step loop) never waits on host work that
    could have happened during the previous step — the role of DALI's
    pipelined stages in the reference (ImageNet/dataloader.py:90-197)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    cancelled = threading.Event()

    def _put(item) -> bool:
        # Bounded put that gives up when the consumer goes away, so an
        # abandoned iterator (break / exception in the step loop) never
        # leaves the producer blocked on a full queue forever.
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:          # surface errors to the consumer
            _put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # Consumer done or abandoned (GeneratorExit lands here): release
        # the producer and let upstream generators run their own cleanup.
        cancelled.set()
        close = getattr(iterator, "close", None)
        if close is not None:
            try:
                t.join(timeout=5.0)
                if not t.is_alive():    # never close a generator mid-next()
                    close()
            except BaseException:
                pass


def imagefolder_batches(root: str, batch_size: int, model_name: str = "",
                        shard: Tuple[int, int] = (0, 1),
                        limit: Optional[int] = None,
                        workers: int = 16, prefetch: int = 2,
                        as_uint8: bool = False):
    """Yield (images NHWC f32, labels i32) eval batches, sharded
    ``shard=(process_index, process_count)`` like the DALI per-rank shards.

    Decode runs on a ``workers``-thread pool (PIL releases the GIL in its
    decode/resize C paths) with ``prefetch`` whole batches in flight ahead
    of the consumer — the host-side analog of the reference's GPU-decode
    DALI pipeline. ``workers=0`` restores the synchronous loop.
    ``as_uint8=True`` yields raw uint8 crops (normalize on device with
    ``normalize_images`` inside the jitted step — the fastest pipeline:
    GIL-light decode + 4x smaller host->device transfers)."""
    loader = load_image_u8 if as_uint8 else load_image
    resize, crop = model_input_size(model_name)
    paths, labels, _ = list_imagefolder(root)
    idx = np.arange(len(paths))[shard[0]::shard[1]]
    if limit:
        idx = idx[:limit]

    def assemble(chunk):
        return (np.stack([loader(paths[j], resize, crop)
                          for j in chunk]),
                np.asarray([labels[j] for j in chunk], np.int32))

    chunks = [idx[i:i + batch_size] for i in range(0, len(idx), batch_size)]
    if workers <= 0:
        for chunk in chunks:
            yield assemble(chunk)
        return

    from concurrent.futures import ThreadPoolExecutor

    def produce():
        with ThreadPoolExecutor(max_workers=workers) as pool:
            # keep `prefetch` batches of decodes in flight, one future
            # per image so decode parallelism spans batch boundaries
            per_batch = []
            for chunk in chunks:
                futs = [pool.submit(loader, paths[j], resize, crop)
                        for j in chunk]
                lab = np.asarray([labels[j] for j in chunk], np.int32)
                per_batch.append((futs, lab))
                if len(per_batch) > prefetch:
                    futs0, lab0 = per_batch.pop(0)
                    yield np.stack([f.result() for f in futs0]), lab0
            for futs0, lab0 in per_batch:
                yield np.stack([f.result() for f in futs0]), lab0

    yield from prefetched(produce(), depth=prefetch)


def synthetic_image_batches(batch_size: int, n_batches: int,
                            crop: int = 224, num_classes: int = 1000,
                            seed: int = 0):
    """Deterministic fake data for smoke tests / calibration dry-runs."""
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield (rng.normal(size=(batch_size, crop, crop, 3)).astype(
            np.float32),
            rng.integers(0, num_classes, batch_size).astype(np.int32))


# ---------------------------------------------------------------------------
# CIFAR-10/100 pipeline (reference dataloader.py get_cifar*_dataloader)
# ---------------------------------------------------------------------------

# normalization constants exactly as the reference's (dataloader.py:8-9 for
# CIFAR-100; CIFAR-10 uses the standard torchvision statistics)
CIFAR100_MEAN = np.array([0.5070751592371323, 0.48654887331495095,
                          0.4409178433670343], np.float32)
CIFAR100_STD = np.array([0.2673342858792401, 0.2564384629170883,
                         0.27615047132568404], np.float32)
CIFAR10_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)


def load_cifar(root: str, which: str = "cifar100",
               split: str = "train") -> Tuple[np.ndarray, np.ndarray]:
    """Read the standard CIFAR python pickle layout from a local directory
    (cifar-10-batches-py/ or cifar-100-python/) -> (uint8 NHWC, labels)."""
    import pickle

    def read(path):
        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin1")

    if which == "cifar10":
        base = os.path.join(root, "cifar-10-batches-py")
        files = ([f"data_batch_{i}" for i in range(1, 6)]
                 if split == "train" else ["test_batch"])
        label_key = "labels"
    else:
        base = os.path.join(root, "cifar-100-python")
        files = ["train" if split == "train" else "test"]
        label_key = "fine_labels"
    if not os.path.isdir(base):      # allow pointing straight at the dir
        base = root
    imgs, labels = [], []
    for name in files:
        d = read(os.path.join(base, name))
        data = np.asarray(d["data"], np.uint8).reshape(-1, 3, 32, 32)
        imgs.append(data.transpose(0, 2, 3, 1))        # NHWC
        labels.extend(d[label_key])
    return np.concatenate(imgs), np.asarray(labels, np.int32)


def _cifar_augment(imgs: np.ndarray, rng) -> np.ndarray:
    """RandomCrop(32, padding=4) + RandomHorizontalFlip (the reference's
    train transform minus the 15-degree rotation, which needs an image
    resampler; divergence documented here). Zero padding like torchvision
    RandomCrop's default fill."""
    n = imgs.shape[0]
    padded = np.pad(imgs, ((0, 0), (4, 4), (4, 4), (0, 0)),
                    mode="constant")
    out = np.empty_like(imgs)
    ys = rng.integers(0, 9, n)
    xs = rng.integers(0, 9, n)
    flip = rng.random(n) < 0.5
    for i in range(n):
        crop = padded[i, ys[i]:ys[i] + 32, xs[i]:xs[i] + 32]
        out[i] = crop[:, ::-1] if flip[i] else crop
    return out


def cifar_batches(root: str, which: str = "cifar100",
                  split: str = "test", batch_size: int = 128,
                  augment: bool = False, seed: int = 0,
                  shard: Tuple[int, int] = (0, 1),
                  limit: Optional[int] = None, prefetch: int = 2):
    """Yield normalized (NHWC f32, labels) batches; train split shuffles
    and augments like the reference transform stack. Augment + normalize
    run in a background thread ``prefetch`` batches ahead (0 = sync)."""
    imgs, labels = load_cifar(root, which, split)
    mean, std = ((CIFAR10_MEAN, CIFAR10_STD) if which == "cifar10"
                 else (CIFAR100_MEAN, CIFAR100_STD))
    rng = np.random.default_rng(seed)
    idx = np.arange(len(imgs))
    if split == "train":
        rng.shuffle(idx)
    idx = idx[shard[0]::shard[1]]
    if limit:
        idx = idx[:limit]

    def produce():
        for i in range(0, len(idx), batch_size):
            chunk = idx[i:i + batch_size]
            x = imgs[chunk]
            if augment:
                x = _cifar_augment(x, rng)
            x = (x.astype(np.float32) / 255.0 - mean) / std
            yield x, labels[chunk]

    if prefetch <= 0:
        yield from produce()
    else:
        yield from prefetched(produce(), depth=prefetch)
