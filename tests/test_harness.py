"""Harness layer: metrics vs sklearn/scipy oracles, data pipelines,
QA post-processing, checkpoint round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.harness import data as D
from ant_quantization_tpu.harness import metrics as M
from ant_quantization_tpu.harness import qa_utils as Q


def test_mcc_f1_match_sklearn(rng):
    from sklearn.metrics import f1_score, matthews_corrcoef
    for _ in range(5):
        y = rng.integers(0, 2, 200)
        p = rng.integers(0, 2, 200)
        assert M.matthews_corrcoef(p, y) == pytest.approx(
            matthews_corrcoef(y, p), abs=1e-9)
        assert M.f1_binary(p, y) == pytest.approx(
            f1_score(y, p), abs=1e-9)


def test_pearson_spearman_match_scipy(rng):
    from scipy.stats import pearsonr, spearmanr
    x = rng.normal(size=100)
    y = 0.5 * x + rng.normal(size=100)
    # introduce ties to exercise average-rank handling
    x[10:20] = x[10]
    assert M.pearson(x, y) == pytest.approx(pearsonr(x, y)[0], abs=1e-9)
    assert M.spearman(x, y) == pytest.approx(spearmanr(x, y)[0], abs=1e-9)


def test_glue_task_metric_routing():
    assert "mcc" in M.glue_compute_metrics("CoLA", [0, 1], [0, 1])
    assert "acc" in M.glue_compute_metrics("sst-2", [0, 1], [0, 1])
    assert "f1" in M.glue_compute_metrics("mrpc", [0, 1], [0, 1])
    assert "pearson" in M.glue_compute_metrics("sts-b", [0.1, 0.9],
                                               [0.0, 1.0])


def test_squad_metrics():
    preds = {"a": "the cat", "b": "dog", "c": ""}
    refs = {"a": ["cat"], "b": ["a cat"], "c": ["unanswerable gold"]}
    m = M.squad_metrics(preds, refs, no_answer_ids=["c"])
    # a: "the" is an article -> normalized match; b: no overlap; c: correct
    assert m["exact_match"] == pytest.approx(100 * 2 / 3)
    assert m["f1"] == pytest.approx(100 * 2 / 3)


def test_lm_blocks_group_texts():
    blocks = D.lm_blocks(np.arange(25), 8)
    assert blocks.shape == (3, 8)          # remainder (1 token) dropped
    np.testing.assert_array_equal(blocks[0], np.arange(8))


def test_glue_tsv_loading(tmp_path):
    # cola layout: no header, label col 1, text col 3
    d = tmp_path / "CoLA"
    d.mkdir()
    (d / "dev.tsv").write_text(
        "gj04\t1\t*\tThe cat sat.\ngj04\t0\t\tBad sentence the.\n")
    ex = D.load_glue_split(str(d), "cola", "dev")
    assert len(ex) == 2
    assert ex[0].text_a == "The cat sat." and ex[0].label == 1
    assert ex[1].label == 0


def test_imagefolder_listing(tmp_path):
    from PIL import Image
    for cls in ("class_b", "class_a"):
        (tmp_path / cls).mkdir()
        Image.new("RGB", (40, 30)).save(tmp_path / cls / "x.jpg")
    paths, labels, classes = D.list_imagefolder(str(tmp_path))
    assert classes == ["class_a", "class_b"]   # sorted -> torchvision order
    assert labels == [0, 1]
    x = D.load_image(paths[0], resize=32, crop=24)
    assert x.shape == (24, 24, 3) and x.dtype == np.float32


def test_qa_postprocess_span_selection():
    ex = [{"id": "q1", "question": "?", "context": "Paris is in France.",
           "answers": ["Paris"], "is_impossible": False}]
    # one feature, 6 tokens; context tokens at 1..4 with char offsets
    offsets = [None, (0, 5), (6, 8), (9, 11), (12, 18), None]
    feats = [{"example_id": "q1", "offset_mapping": offsets}]
    s = np.full((1, 6), -10.0)
    e = np.full((1, 6), -10.0)
    s[0, 1] = 5.0   # start at "Paris"
    e[0, 1] = 4.0   # end at "Paris"
    e[0, 4] = 2.0
    preds = Q.postprocess_predictions(ex, feats, s, e)
    assert preds["q1"] == "Paris"


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from ant_quantization_tpu.calibrate.spec import placeholder_state
    from ant_quantization_tpu.harness import checkpoint as C

    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)},
            "quant": {"layer": {"weight_q": placeholder_state(3)}}}
    C.save_checkpoint(str(tmp_path / "ck"), tree, step=2)
    assert C.latest_step(str(tmp_path / "ck")) == 2
    back = C.restore_checkpoint(str(tmp_path / "ck"), template=tree)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    st = back["quant"]["layer"]["weight_q"]
    assert st.grid.shape == (256,) and int(st.bit) == 0


def test_zoo_presets():
    from ant_quantization_tpu.harness import zoo
    from ant_quantization_tpu.nn.config import FP32
    model, cfg, params = zoo.get_lm("opt:125m", FP32)
    assert cfg.d_ff == 3072 and params is None
    model, conv, v = zoo.get_image_model("resnet18", FP32)
    assert v is None


def test_cifar_pipeline(tmp_path):
    """load_cifar/cifar_batches read the standard pickle layout (synthetic
    files) and normalize with the reference constants."""
    import pickle
    import numpy as np
    from ant_quantization_tpu.harness import data as D

    base = tmp_path / "cifar-100-python"
    base.mkdir()
    rng = np.random.default_rng(0)
    for name, n in (("train", 64), ("test", 32)):
        d = {"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
             "fine_labels": rng.integers(0, 100, n).tolist()}
        with open(base / name, "wb") as f:
            pickle.dump(d, f)

    imgs, labels = D.load_cifar(str(tmp_path), "cifar100", "test")
    assert imgs.shape == (32, 32, 32, 3) and labels.shape == (32,)

    batches = list(D.cifar_batches(str(tmp_path), "cifar100", "test",
                                   batch_size=16))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.float32
    # normalized: roughly zero-centered
    assert abs(float(x.mean())) < 1.0

    aug = list(D.cifar_batches(str(tmp_path), "cifar100", "train",
                               batch_size=16, augment=True))
    assert aug[0][0].shape == (16, 32, 32, 3)


def test_grad_accum_matches_full_batch():
    """grad_accum microbatching: identical update to the full-batch step
    (mean-of-means; SGD)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from ant_quantization_tpu.harness import train as T
    from ant_quantization_tpu.models.cnn import AlexNet
    from ant_quantization_tpu.nn.config import QuantConfig

    model = AlexNet(QuantConfig(enabled=False), num_classes=10)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (4,)))
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    tx = optax.sgd(0.1)
    s0 = T.TrainState(variables["params"], None, tx.init(variables["params"]),
                      {})
    full = T.make_classification_step(model, tx)
    acc = T.make_classification_step(model, tx, grad_accum=2)
    s1, l1 = full(s0, images, labels)
    s2, l2 = acc(s0, images, labels)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)


def test_prefetched_preserves_order_and_errors():
    from ant_quantization_tpu.harness.data import prefetched

    assert list(prefetched(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetched(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_imagefolder_parallel_matches_sync(tmp_path):
    """Threaded u8 pipeline == synchronous f32 pipeline after on-device
    normalization (same images, same order)."""
    import numpy as np
    from PIL import Image

    from ant_quantization_tpu.harness import data as D

    rng = np.random.default_rng(0)
    for c in range(2):
        d = tmp_path / f"class_{c}"
        d.mkdir()
        for i in range(7):
            arr = rng.integers(0, 255, (80, 100, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    sync = list(D.imagefolder_batches(str(tmp_path), 4, "resnet18",
                                      workers=0))
    par = list(D.imagefolder_batches(str(tmp_path), 4, "resnet18",
                                     workers=4, prefetch=2))
    par_u8 = list(D.imagefolder_batches(str(tmp_path), 4, "resnet18",
                                        workers=4, as_uint8=True))
    assert len(sync) == len(par) == len(par_u8) == 4  # 14 imgs / bs 4
    for (xs, ls), (xp, lp), (xu, lu) in zip(sync, par, par_u8):
        np.testing.assert_array_equal(ls, lp)
        np.testing.assert_array_equal(ls, lu)
        np.testing.assert_allclose(xs, xp, rtol=1e-6)
        np.testing.assert_allclose(
            xs, np.asarray(D.normalize_images(jnp.asarray(xu))),
            rtol=1e-5, atol=1e-5)
