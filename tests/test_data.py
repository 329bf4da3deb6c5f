"""Data pipeline tests on synthetic fixtures (no real datasets needed)."""

import os

import numpy as np
import pytest

from dcfp_tpu.data.datasets import (ADEDataset, CityscapesDataset,
                                    COCOStuffDataset, ContextDataset,
                                    build_dataset)
from dcfp_tpu.data.label_index import build_label_index
from dcfp_tpu.data.loader import EvalLoader, TrainLoader, collate
from dcfp_tpu.data.synthetic import (make_cityscapes_fixture,
                                     make_shifted_fixture)


@pytest.fixture(scope="module")
def cs_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cs"))
    manifest = make_cityscapes_fixture(root, n_images=6, hw=(96, 128))
    return root, manifest


def test_cs_remap_matches_reference_dict(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(64, 64))
    raw = np.arange(0, 34, dtype=np.uint8).reshape(2, 17)
    got = ds.id2trainId(raw)
    # oracle: the reference's dict-loop semantics
    want = raw.astype(np.int64).copy()
    for k, v in CityscapesDataset.ID_TO_TRAINID.items():
        want[raw == k] = v
    np.testing.assert_array_equal(got, want)
    # reverse remap round-trips non-void ids
    fwd = ds.id2trainId(np.array([[7, 26, 33]], np.uint8))
    back = ds.id2trainId(fwd, reverse=True)
    np.testing.assert_array_equal(back, [[7, 26, 33]])


def test_train_item_shapes_and_values(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(64, 64), seed=1)
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["img"].dtype == np.float32
    lab = item["label"]
    assert lab.shape == (64, 64)
    vals = set(np.unique(lab).tolist())
    assert vals <= set(range(19)) | {255}


def test_balance2_weight_formula(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(64, 64), balance=2, beta=0.99)
    lab = np.zeros((8, 8), np.int64)
    lab[:4] = 3
    lab[7, 7] = 255
    labels = ds.get_label(lab, {"class": 3})
    assert set(labels) == {"ori", "weight"}
    counts = np.bincount(np.where(lab == 255, 19, lab).ravel(),
                         minlength=20)[:-1]
    want = (1 + 1e-8 - 0.99 ** counts[3]) / (1 + 1e-8 - 0.99 ** counts)
    want = np.clip(want, 0, 1)
    np.testing.assert_allclose(labels["weight"][0, 0], want[3], rtol=1e-6)
    np.testing.assert_allclose(labels["weight"][5, 0], want[0], rtol=1e-6)
    assert labels["weight"][7, 7] == 0.0  # ignore pixel


def test_label_index_and_resample(cs_fixture, tmp_path):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(48, 48))
    pkl = str(tmp_path / "label_index_CS.pkl")
    index = build_label_index(ds, pkl)
    assert index["label_f"].shape == (19,)

    rds = CityscapesDataset(root, manifest, split="train",
                            crop_size=(48, 48), resample=True, balance=2,
                            label_index_path=pkl, seed=3)
    rds.pre_processing(epoch=0)
    present = int((index["label_f"] > 0).sum())
    assert len(rds) == int(index["label_f"].max()) * present
    item = rds[0]
    assert "weight" in item["label"]
    # deterministic across "processes": same seed+epoch -> same index
    rds2 = CityscapesDataset(root, manifest, split="train",
                             crop_size=(48, 48), resample=True, balance=2,
                             label_index_path=pkl, seed=3)
    rds2.pre_processing(epoch=0)
    assert rds.file_index == rds2.file_index
    assert rds.class_index == rds2.class_index
    rds2.pre_processing(epoch=1)
    assert rds.file_index != rds2.file_index  # epochs differ


def test_train_loader_batches(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(32, 32), seed=0)
    loader = TrainLoader(ds, batch_size=4, prefetch=2)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["img"].shape == (4, 32, 32, 3)
        assert batch["label"].shape == (4, 32, 32)
        assert len(batch["img_meta"]) == 4
    loader.stop()


def test_val_loader(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="val", crop_size=(64, 64))
    loader = EvalLoader(ds, batch_size=1)
    batches = list(loader)
    assert len(batches) == 6
    assert batches[0]["img"].shape == (1, 96, 128, 3)
    assert batches[0]["label"].shape == (1, 96, 128)


@pytest.mark.parametrize("fmt,cls,nc", [
    ("CTX", ContextDataset, 59),
    ("ADE", ADEDataset, 150),
    ("COCO", COCOStuffDataset, 171),
])
def test_shifted_datasets(tmp_path, fmt, cls, nc):
    root = str(tmp_path)
    manifest = make_shifted_fixture(root, fmt=fmt, num_classes=nc)
    ds = cls(root, manifest, split="train", crop_size=(48, 48))
    assert ds.num_classes == nc
    item = ds[0]
    lab = item["label"]
    vals = set(np.unique(lab).tolist())
    assert vals <= set(range(nc)) | {255}
    # raw 0 becomes ignore under the -1 shift
    assert ds.id2trainId(np.zeros((2, 2), np.uint8))[0, 0] == 255


def test_registry_dispatch(cs_fixture):
    root, manifest = cs_fixture
    ds = build_dataset("CS", root, manifest, split="val")
    assert isinstance(ds, CityscapesDataset)
    with pytest.raises(KeyError):
        build_dataset("nope", root, manifest)


# ---------------------------------------------------------------------------
# vendored manifests + label-index fixtures (reference datasets/list/)
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIST = os.path.join(_REPO, "datasets", "list")


@pytest.mark.parametrize("ds,lst,split,n,pkl_classes", [
    ("CS", "cityscapes/train.lst", "train", 2975, 19),
    ("CS", "cityscapes/trainval.lst", "trainval", 3475, 19),
    ("CS", "cityscapes/val.lst", "val", 500, None),
    ("CTX", "ctx/train.txt", "train", 4998, 59),
    ("ADE", "ade/training.odgt", "train", 20210, 150),
    ("COCO", "cocostuff/train.txt", "train", 9000, 171),
])
def test_vendored_manifests_load(ds, lst, split, n, pkl_classes):
    """The vendored datasets/list/ manifests (reference datasets/list/,
    mypath.py:8-43) construct real datasets with resample indexes; the
    scripts are runnable the moment data is mounted."""
    list_path = os.path.join(_LIST, lst)
    resample = pkl_classes is not None
    d = build_dataset(ds, "/data-not-mounted", list_path, split=split,
                      resample=resample, crop_size=(64, 64))
    assert len(d.files) == n
    if resample:
        assert d.class_files is not None
        assert len(d.class_files["label_f"]) == pkl_classes == d.num_classes
        # every per-class entry indexes into the manifest
        for c in (0, d.num_classes - 1):
            entries = d.class_files[str(c)]
            assert entries and all(0 <= e["idx"] < n for e in entries)


def test_vendored_paths_registry_resolves():
    """paths.data_dir defaults point at files that exist in this repo."""
    from dcfp_tpu.data import paths
    os.chdir(_REPO)  # lists are repo-relative like the reference
    for ds, split in [("CS", "train"), ("CS", "train+"), ("CS", "train++"),
                      ("CS", "trainval"), ("CS", "val"), ("CS", "test"),
                      ("CTX", "train"), ("CTX", "train_all"), ("CTX", "val"),
                      ("ADE", "train"), ("ADE", "val"),
                      ("COCO", "train"), ("COCO", "val")]:
        _, lst = paths.data_dir(ds, split)
        assert os.path.isfile(lst), (ds, split, lst)


def test_compact_item_matches_classic(cs_fixture):
    """compact=True (uint8 crops + deferred normalize, engine/trainer.
    expand_batch) must reproduce the classic f32 path exactly, including
    the post-normalize zero padding and the mirrored flip."""
    import jax.numpy as jnp
    from dcfp_tpu.data.loader import collate
    from dcfp_tpu.engine.trainer import expand_batch

    kw = dict(split="train", crop_size=(112, 144), balance=1, scale=True,
              mirror=True, brightness=True)
    root, manifest = cs_fixture
    classic = CityscapesDataset(root, manifest, seed=7, **kw)
    compact = CityscapesDataset(root, manifest, seed=7, compact=True, **kw)

    batch_classic = collate([classic[i] for i in range(3)])
    batch_compact = collate([compact[i] for i in range(3)])
    assert batch_compact["img"].dtype == np.uint8
    assert batch_compact["label"]["ori"].dtype == np.uint8
    assert batch_compact["label"]["weight_class"].shape == (3, 20)

    import jax
    dev_batch = jax.tree.map(jnp.asarray, {
        k: v for k, v in batch_compact.items() if k != "img_meta"})
    img, labels = expand_batch(dev_batch, (compact.mean, compact.std),
                               19, 255, jnp.float32)
    np.testing.assert_allclose(np.asarray(img), batch_classic["img"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels["ori"]),
                                  batch_classic["label"]["ori"])
    np.testing.assert_allclose(np.asarray(labels["weight"]),
                               batch_classic["label"]["weight"],
                               rtol=1e-6, atol=1e-7)


def test_train_loader_worker_invariance(cs_fixture):
    """The decode-worker pool produces byte-identical batches to the
    sequential path (per-batch reseeding makes the stream deterministic
    in (seed, epoch, batch, rank) — torch DataLoader workers can't do
    this), and batches come out in order."""
    root, manifest = cs_fixture

    def first_batches(num_workers, n=5):
        ds = CityscapesDataset(root, manifest, split="train",
                               crop_size=(32, 32), seed=3)
        loader = TrainLoader(ds, batch_size=2, seed=11,
                             num_workers=num_workers,
                             use_processes=num_workers > 1)
        it = iter(loader)
        out = [next(it) for _ in range(n)]
        loader.stop()
        return out

    seq = first_batches(0)
    par = first_batches(3)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_train_loader_rank_sharding(cs_fixture):
    """rank/world stride-split the shared epoch permutation
    (DistributedSampler semantics, reference engine.py:81-93): the union
    of all ranks' samples per epoch is the full permutation and ranks
    are disjoint."""
    root, manifest = cs_fixture

    def epoch_indices(rank, world):
        ds = CityscapesDataset(root, manifest, split="train",
                               crop_size=(32, 32), seed=0)
        loader = TrainLoader(ds, batch_size=1, seed=5, rank=rank,
                             world=world, prefetch=0)
        it = iter(loader)
        # 6 images / 2 ranks -> 3 batches of 1 per epoch
        return [next(it)["img_meta"][0]["idx"] for _ in range(3)]

    r0 = epoch_indices(0, 2)
    r1 = epoch_indices(1, 2)
    assert not set(r0) & set(r1)
    assert set(r0) | set(r1) == set(range(6))


def test_eval_loader_rank_sharding(cs_fixture):
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="val", crop_size=(64, 64))
    seen = []
    for rank in range(3):
        loader = EvalLoader(ds, batch_size=1, rank=rank, world=3)
        assert len(loader) == 2
        seen += [b["img_meta"][0]["idx"] for b in loader]
    assert sorted(seen) == list(range(6))


class _Unpicklable(RuntimeError):
    """An exception whose args cannot cross a multiprocessing queue."""

    def __init__(self):
        super().__init__("boom")
        self.payload = lambda: None  # unpicklable attribute


class _ExplodingDataset:
    def __init__(self, inner):
        self.inner = inner

    def __len__(self):
        return len(self.inner)

    def __getattr__(self, name):  # delegate pre_processing, rng, ...
        return getattr(self.inner, name)

    def __setattr__(self, name, value):
        if name == "inner":
            object.__setattr__(self, name, value)
        else:
            setattr(self.inner, name, value)

    def __getitem__(self, i):
        raise _Unpicklable()


def test_train_loader_worker_error_surfaces(cs_fixture):
    """A decode-worker failure — even one whose exception object cannot
    be pickled back across the result queue — surfaces to the consumer
    instead of stranding it (loader.py _decode_worker fallback)."""
    root, manifest = cs_fixture
    ds = _ExplodingDataset(CityscapesDataset(
        root, manifest, split="train", crop_size=(32, 32), seed=3))
    loader = TrainLoader(ds, batch_size=2, seed=11, num_workers=2,
                         use_processes=True)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))
    loader.stop()


def test_rank_split_pads_to_equal_length(cs_fixture):
    """With len(dataset) not divisible by world, every rank must still
    see the same number of samples per epoch (torch DistributedSampler
    pads from the head of the permutation) — unequal counts would
    desync epoch boundaries across processes."""
    from dcfp_tpu.data.loader import _epoch_order
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(32, 32), seed=0)
    assert len(ds) == 6
    # drop to an odd length via a fake wrapper
    class Odd:
        def __len__(self):
            return 7
    counts = {r: len(_epoch_order(Odd(), seed=5, epoch=0, rank=r,
                                  world=2)) for r in (0, 1)}
    assert counts[0] == counts[1] == 4
    # the union covers the full permutation; the pad duplicates one head
    a = _epoch_order(Odd(), 5, 0, 0, 2)
    b = _epoch_order(Odd(), 5, 0, 1, 2)
    assert set(np.concatenate([a, b])) == set(range(7))

    # world > len(dataset): torch repeats the permutation — every rank
    # must still get exactly one sample (zero-batch ranks would hang
    # collectives)
    class Tiny:
        def __len__(self):
            return 3
    tiny_counts = [len(_epoch_order(Tiny(), 5, 0, r, 8)) for r in range(8)]
    assert tiny_counts == [1] * 8


def test_eval_loader_worker_error_surfaces(cs_fixture):
    """An eval decode-worker failure — even an unpicklable exception —
    surfaces to the consumer (loader.py _eval_decode_worker fallback)."""
    root, manifest = cs_fixture
    ds = _ExplodingDataset(CityscapesDataset(
        root, manifest, split="val", crop_size=(32, 32), seed=3))
    loader = EvalLoader(ds, batch_size=1, num_workers=2,
                        use_processes=True)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))


def test_eval_loader_worker_pool_matches_sequential(cs_fixture):
    """EvalLoader's decode-process pool yields byte-identical batches in
    the same order as the sequential path (reference test DataLoader
    workers, engine.py:95-115)."""
    root, manifest = cs_fixture
    ds = CityscapesDataset(root, manifest, split="val",
                           crop_size=(32, 32), seed=0)
    seq = list(EvalLoader(ds, batch_size=1, prefetch=0))
    par = list(EvalLoader(ds, batch_size=1, num_workers=2,
                          use_processes=True))
    assert len(seq) == len(par) > 0
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_get_label_matches_reference_weights():
    """Balance weight maps vs the reference's own get_label
    (Base.py:73-89), both balance modes, methods called unbound on the
    same stub instance — the GSRL loss consumes these maps, so they
    must be numerically identical."""
    import sys
    import types
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from datasets.Base import BaseDataSet as RefBase
    from dcfp_tpu.data.base import BaseDataset as OurBase

    r = np.random.default_rng(7)
    label = r.integers(0, 6, (33, 41)).astype(np.int64)
    label[r.random((33, 41)) < 0.2] = 255
    for balance in (1, 2):
        stub = types.SimpleNamespace(balance=balance, ignore_label=255,
                                     num_classes=6, beta=0.99)
        meta = {"class": 3}
        want = RefBase.get_label(stub, label, meta)
        got = OurBase.get_label(stub, label, meta)
        np.testing.assert_array_equal(got["ori"], want["ori"])
        np.testing.assert_allclose(got["weight"], want["weight"],
                                   rtol=1e-6, err_msg=f"balance={balance}")
