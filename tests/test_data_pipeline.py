"""Dataset layer, minibatch builder, and loader integration tests on a
synthetic COCO dataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from sad_tpu.config import Config
from sad_tpu.config.catalog import DatasetSpec
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.data.dataset import (
    CocoDataset,
    combined_roidb_for_training,
    filter_for_training,
    flip_entry,
)
from sad_tpu.data.loader import TrainingLoader
from sad_tpu.data.minibatch import (
    RetinaNetMinibatchBuilder,
    canvas_shapes,
    compute_im_scale,
    prep_image,
)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 1
    for i in range(1, 7):
        w, h = (96, 64) if i % 2 else (64, 96)
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        images.append({"id": i, "file_name": f"{i:06d}.jpg", "height": h, "width": w})
        anns.append(
            {"id": aid, "image_id": i, "category_id": 17, "bbox": [8, 8, 30, 20],
             "area": 600, "iscrowd": 0}
        )
        aid += 1
        if i == 3:  # one crowd box
            anns.append(
                {"id": aid, "image_id": i, "category_id": 17,
                 "bbox": [2, 2, 10, 10], "area": 100, "iscrowd": 1}
            )
            aid += 1
    cats = [{"id": 17, "name": "cat"}, {"id": 42, "name": "dog"}]
    ann_file = root / "instances.json"
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)
    spec = DatasetSpec("synth", str(img_dir), str(ann_file))
    return spec


def tiny_train_cfg(distill=False):
    d = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 3},
        "NUM_GPUS": 1,
        "FPN": {
            "FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
            "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128,
        },
        "RETINANET": {
            "RETINANET_ON": True, "ASPECT_RATIOS": (1.0, 2.0),
            "SCALES_PER_OCTAVE": 1,
        },
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2},
    }
    if distill:
        d["MODEL"]["TYPE"] = "distillation"
        d["DISTILLATION"] = {"DISTILLATION_ON": True}
    return merge_cfg_from_dict(Config(), d)


class TestDataset:
    def test_category_mapping_and_gt(self, synth_dataset):
        ds = CocoDataset(synth_dataset)
        assert ds.num_classes == 3  # bg + 2
        assert ds.json_to_contiguous == {17: 1, 42: 2}
        roidb = ds.get_roidb()
        assert len(roidb) == 6
        e = roidb[0]
        assert e["boxes"].shape == (1, 4)
        # xywh [8,8,30,20] -> xyxy [8,8,37,27] (legacy +1)
        np.testing.assert_allclose(e["boxes"][0], [8, 8, 37, 27])
        assert e["gt_classes"][0] == 1
        # crowd kept with flag
        e3 = roidb[2]
        assert e3["is_crowd"].sum() == 1

    def test_flip_entry(self, synth_dataset):
        ds = CocoDataset(synth_dataset)
        e = ds.get_roidb()[0]
        f = flip_entry(e)
        assert f["flipped"]
        w = e["width"]
        np.testing.assert_allclose(f["boxes"][0, 0], w - e["boxes"][0, 2] - 1)
        np.testing.assert_allclose(f["boxes"][0, 2], w - e["boxes"][0, 0] - 1)

    def test_flip_entry_swaps_keypoint_channels(self, tmp_path):
        """Training flips must permute left/right keypoint channels via the
        dataset's keypoint-name metadata (ref: keypoints.py:71-86
        flip_keypoints applied in roidb.py extend_with_flipped_entries)."""
        import json as _json

        names = ["nose", "left_eye", "right_eye"]
        images = [{"id": 1, "file_name": "a.jpg", "height": 50, "width": 100}]
        anns = [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0,
            # nose visible at (20,15); left_eye visible at (30,12);
            # right_eye NOT annotated (v=0, x=y=0)
            "keypoints": [20, 15, 2, 30, 12, 2, 0, 0, 0],
        }]
        cats = [{"id": 1, "name": "person", "keypoints": names,
                 "skeleton": []}]
        ann_file = tmp_path / "kp.json"
        with open(ann_file, "w") as f:
            _json.dump(
                {"images": images, "annotations": anns, "categories": cats}, f
            )
        ds = CocoDataset(DatasetSpec("kp_synth", str(tmp_path), str(ann_file)))
        assert ds.keypoints == names
        e = ds.get_roidb()[0]
        f = flip_entry(e)
        kp = f["gt_keypoints"][0]
        w = e["width"]
        # nose: unpaired channel, x mirrored
        np.testing.assert_allclose(kp[0], [w - 20 - 1, 15, 2])
        # left_eye data landed in the right_eye channel (mirrored x)
        np.testing.assert_allclose(kp[2], [w - 30 - 1, 12, 2])
        # the (formerly empty) right_eye channel moved to left_eye: v=0, x=0
        np.testing.assert_allclose(kp[1], [0, 0, 0])

    def test_rle_segms_kept_flipped_and_min_area(self, tmp_path):
        """RLE segmentations survive the parse (json_dataset.py:197 keeps
        dicts), flip correctly (segms.py flip_segms RLE branch), tiny
        polygons are dropped (json_dataset.py:178-182), and
        TRAIN.GT_MIN_AREA filters annotations (json_dataset.py:183)."""
        import json as _json

        from sad_tpu.utils.segms import rle_to_mask

        h, w = 8, 12
        # 3x2 filled block at cols 2-4(excl), rows 1-3(excl): column-major RLE
        mask = np.zeros((h, w), np.uint8)
        mask[1:3, 2:4] = 1
        flat = mask.reshape(-1, order="F")
        runs, counts, val = [], [], 0
        n = 0
        for v in flat:
            if v == val:
                n += 1
            else:
                counts.append(n)
                val, n = v, 1
        counts.append(n)
        rle = {"size": [h, w], "counts": counts}

        images = [{"id": 1, "file_name": "a.jpg", "height": h, "width": w}]
        anns = [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 1,
             "bbox": [2, 1, 2, 2], "area": 4, "segmentation": rle},
            # polygon ann with one degenerate (<6 coords) and one valid poly
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [1, 1, 6, 5], "area": 30,
             "segmentation": [[1, 1, 6, 1], [1, 1, 6, 1, 6, 5, 1, 5]]},
            # below-min-area ann (dropped when gt_min_area=3)
            {"id": 3, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [0, 0, 2, 1], "area": 2, "segmentation": []},
        ]
        ann_file = tmp_path / "rle.json"
        with open(ann_file, "w") as f:
            _json.dump(
                {"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "thing"}]}, f,
            )
        ds = CocoDataset(DatasetSpec("rle_synth", str(tmp_path), str(ann_file)))
        e = ds.get_roidb(gt_min_area=3)[0]
        assert len(e["boxes"]) == 2  # min-area ann filtered
        assert isinstance(e["segms"][0], dict)
        assert e["segms"][1] == [[1, 1, 6, 1, 6, 5, 1, 5]]  # tiny poly dropped

        f = flip_entry(e)
        fm = rle_to_mask(f["segms"][0])
        np.testing.assert_array_equal(fm, mask[:, ::-1])

        # the RLE instance rasterizes in the mask-target builder
        orig = rle_to_mask(e["segms"][0])
        np.testing.assert_array_equal(orig, mask)

    def test_filter_requires_visible_keypoints_when_asked(self):
        """Keypoint training drops images with no visible keypoints
        (ref: roidb.py filter_for_training has_visible_keypoints)."""
        from sad_tpu.data.dataset import filter_for_training

        def entry(kp):
            return {
                "gt_classes": np.asarray([1], np.int32),
                "is_crowd": np.zeros(1, bool),
                "gt_keypoints": kp,
            }

        visible = entry(np.asarray([[[5, 5, 2]]], np.float32))
        invisible = entry(np.zeros((1, 1, 3), np.float32))
        none = entry(np.zeros((0, 1, 3), np.float32))
        roidb = [visible, invisible, none]
        assert len(filter_for_training(roidb)) == 3
        kept = filter_for_training(roidb, require_keypoints=True)
        assert kept == [visible]

    def test_filter_keeps_only_gt_images(self, synth_dataset):
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        roidb[0]["gt_classes"] = np.zeros((0,), np.int32)
        roidb[0]["boxes"] = np.zeros((0, 4), np.float32)
        roidb[0]["is_crowd"] = np.zeros((0,), bool)
        assert len(filter_for_training(roidb)) == 5


class TestMinibatch:
    def test_canvas_and_scale(self):
        cfg = tiny_train_cfg()
        land, port = canvas_shapes(cfg)
        assert land == (128, 128) and port == (128, 128)
        # 64-shortest-side scaling with 128 long cap
        assert compute_im_scale(64, 96, 64, 128) == 1.0
        assert compute_im_scale(100, 300, 64, 128) == pytest.approx(128 / 300)

    def test_prep_image_normalization_order(self):
        im = np.full((4, 4, 3), 100, np.uint8)
        out = prep_image(im, 1.0, (10.0, 20.0, 30.0), 2.0, (1.0, 2.0, 4.0))
        # (100/2 - mean) / std
        np.testing.assert_allclose(out[0, 0], [(50 - 10) / 1, (50 - 20) / 2, (50 - 30) / 4])

    def test_build_batch_shapes_and_fg(self, synth_dataset):
        cfg = tiny_train_cfg(distill=True)
        teacher_cfg = merge_cfg_from_dict(
            tiny_train_cfg(), {"PIXEL_MEANS": (0.0, 0.0, 0.0)}
        )
        ds = CocoDataset(synth_dataset)
        roidb = [e for e in ds.get_roidb() if e["width"] >= e["height"]][:2]
        builder = RetinaNetMinibatchBuilder(
            cfg, teacher_cfg, device_normalize=False
        )
        batch = builder.build(roidb)
        assert batch.data.shape == (2, 128, 128, 3)
        assert batch.teacher_data.shape == (2, 128, 128, 3)
        # teacher normalization differs (different pixel means)
        assert not np.allclose(batch.data, batch.teacher_data)
        a = cfg.num_anchors_per_cell()
        for lvl in cfg.fpn_levels():
            s = 2 ** lvl
            assert batch.labels[lvl].shape == (2, 128 // s, 128 // s, a)
            assert batch.bbox_targets[lvl].shape == (2, 128 // s, 128 // s, a, 4)
        assert batch.fg_num.shape == (1,)  # one group of 2 images
        assert batch.fg_num[0] > 0  # the 30x20 gt matches some anchor
        total_fg_mask = sum(m.sum() for m in batch.fg_mask.values())
        assert total_fg_mask > 0

    def test_multiscale_samples_per_image(self, synth_dataset):
        """TRAIN.SCALES with >1 entry must actually be sampled per image
        (ref: roi_data/minibatch.py _get_image_blob scale_inds)."""
        cfg = merge_cfg_from_dict(
            tiny_train_cfg(), {"TRAIN": {"SCALES": (32, 48, 64), "IMS_PER_BATCH": 1}}
        )
        ds = CocoDataset(synth_dataset)
        roidb = [e for e in ds.get_roidb() if e["width"] >= e["height"]][:1]
        builder = RetinaNetMinibatchBuilder(cfg)
        seen = set()
        for seed in range(16):
            batch = builder.build(roidb, seed=seed)
            seen.add(float(batch.im_scale[0]))
        # the 64x96 image at shortest-side targets 32/48/64 -> 3 scales
        assert len(seen) == 3
        # determinism: same seed -> same scale
        a = builder.build(roidb, seed=5).im_scale[0]
        b = builder.build(roidb, seed=5).im_scale[0]
        assert a == b


class TestLoader:
    def test_loader_alternates_and_shuts_down(self, synth_dataset):
        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        unlabeled = [dict(e, id=e["id"] + 100) for e in roidb]
        loader = TrainingLoader(
            cfg, roidb, None, unlabeled, batch_images=2, num_threads=2,
            queue_capacity=2,
        ).start()
        try:
            batches = [loader.get_next_batch() for _ in range(4)]
            for b in batches:
                assert b["data_u8"].shape[0] == 2  # DEVICE_NORMALIZE default
                assert b["fg_num"].shape == (1,)
        finally:
            loader.shutdown()

    def test_loader_propagates_worker_errors(self, synth_dataset):
        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        for e in roidb:
            e["image"] = "/nonexistent/path.jpg"
        loader = TrainingLoader(cfg, roidb, batch_images=2, num_threads=1).start()
        try:
            with pytest.raises(RuntimeError):
                loader.get_next_batch()
        finally:
            loader.shutdown()


class TestDevicePrefetcher:
    """Host->device double buffering (the BlobsQueue equivalent)."""

    class _Fake:
        def __init__(self, n=5, fail_at=None):
            self.i = 0
            self.n = n
            self.fail_at = fail_at
            self.down = False

        def get_next_batch(self):
            import time

            if self.fail_at is not None and self.i == self.fail_at:
                raise ValueError("boom")
            if self.i >= self.n:
                time.sleep(3600)  # block like an empty queue
            self.i += 1
            return {"x": np.full((2,), self.i, np.float32)}

        def queue_depth(self):
            return 0

        def shutdown(self):
            self.down = True

    def test_order_and_device_placement(self):
        import jax

        from sad_tpu.data.loader import DevicePrefetcher

        pf = DevicePrefetcher(self._Fake(n=4))
        try:
            vals = [float(pf.get_next_batch()["x"][0]) for _ in range(4)]
            assert vals == [1.0, 2.0, 3.0, 4.0]
            b = None
        finally:
            pf.shutdown()

    def test_error_propagates(self):
        from sad_tpu.data.loader import DevicePrefetcher

        pf = DevicePrefetcher(self._Fake(n=4, fail_at=1))
        try:
            pf.get_next_batch()  # first batch fine
            with pytest.raises(RuntimeError, match="device prefetch failed"):
                pf.get_next_batch()
        finally:
            pf.shutdown()

    def test_shutdown_propagates(self):
        from sad_tpu.data.loader import DevicePrefetcher

        fake = self._Fake(n=2)
        pf = DevicePrefetcher(fake)
        pf.get_next_batch()
        pf.shutdown()
        assert fake.down


class _HardCrashBuilder:
    """Picklable builder that hard-kills the worker process (no traceback
    path) — simulates an OOM-kill / native segfault."""

    def build(self, entries, seed=None):
        import os as _os

        _os._exit(3)


class _JitterBuilder:
    """Picklable near-instant builder with seed-dependent jitter — maximizes
    out-of-order completion and queue-boundary races without image IO."""

    def build(self, entries, seed=None):
        import time as _time

        _time.sleep(((seed or 0) % 7) * 1e-4)
        return {"seed": seed, "ids": [e["id"] for e in entries]}


def test_two_stream_loader_never_deadlocks(synth_dataset):
    """Regression: the chip dress rehearsal deadlocked (round 4, SIGABRT
    stack dump) with every worker blocked put()ing to the FULL labeled
    queue while the consumer's parity wanted an unlabeled batch nobody was
    building. Hammer the same shape — two streams, minimal capacity, more
    workers than capacity, fast jittered builds — for 600 parity-alternating
    gets under a watchdog. Also re-proves the byte-identical stream: seeds
    must follow the per-stream schedule exactly."""
    import threading

    cfg = tiny_train_cfg()
    ds = CocoDataset(synth_dataset)
    roidb = ds.get_roidb()
    unlabeled = [dict(e, id=e["id"] + 100) for e in roidb]
    loader = TrainingLoader(
        cfg, roidb, None, unlabeled, batch_images=2, num_threads=4,
        queue_capacity=1, builder=_JitterBuilder(),
    ).start()
    got = []
    done = threading.Event()

    def consume():
        for _ in range(600):
            got.append(loader.get_next_batch())
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=120.0)
    try:
        assert done.is_set(), (
            f"two-stream loader deadlocked after {len(got)} batches"
        )
        # deterministic interleave: even batches labeled (ids < 100), odd
        # unlabeled; seeds follow each stream's own schedule
        from sad_tpu.data.loader import _Stream

        lab = _Stream(roidb, 2, 3)
        unl = _Stream(unlabeled, 2, 4)
        for k, b in enumerate(got):
            stream = lab if k % 2 == 0 else unl
            idxs, bseed, _ = stream.next_batch_indices_seeded()
            assert b["seed"] == bseed
            assert b["ids"] == [stream.roidb[i]["id"] for i in idxs]
    finally:
        loader.shutdown()


class TestMultiprocessLoader:
    """Process-pool minibatch building (data/mp_loader.py) behind the
    TrainingLoader interface."""

    def test_matches_threaded_loader_batch_for_batch(self, synth_dataset):
        """1 worker + 1 thread consume the same _Stream order with the same
        per-batch seed schedule -> byte-identical batches."""
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        mp_loader = MultiprocessTrainingLoader(
            cfg, roidb, batch_images=2, num_workers=1, queue_capacity=2,
        ).start()
        th_loader = TrainingLoader(
            cfg, roidb, batch_images=2, num_threads=1, queue_capacity=2,
        ).start()
        try:
            for _ in range(3):
                a = mp_loader.get_next_batch()
                b = th_loader.get_next_batch()
                assert set(a) == set(b)
                np.testing.assert_array_equal(a["data_u8"], b["data_u8"])
                np.testing.assert_array_equal(a["fg_num"], b["fg_num"])
                for lvl in cfg.fpn_levels():
                    np.testing.assert_array_equal(
                        a["labels"][lvl], b["labels"][lvl]
                    )
        finally:
            mp_loader.shutdown()
            th_loader.shutdown()

    def test_alternates_streams_with_parity(self, synth_dataset):
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        unlabeled = [dict(e, id=e["id"] + 100) for e in roidb]
        loader = MultiprocessTrainingLoader(
            cfg, roidb, None, unlabeled, batch_images=2, num_workers=2,
            queue_capacity=2,
        ).start()
        try:
            for _ in range(4):
                b = loader.get_next_batch()
                assert b["data_u8"].shape[0] == 2
        finally:
            loader.shutdown()

    def test_detects_silently_dead_workers(self, synth_dataset):
        """A worker killed without shipping a traceback (OOM-kill/segfault)
        must surface as an error, not hang the consumer forever."""
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        loader = MultiprocessTrainingLoader(
            cfg, roidb, batch_images=2, num_workers=1,
            builder=_HardCrashBuilder(),
        )
        loader.start()
        try:
            with pytest.raises(RuntimeError) as exc_info:
                loader.get_next_batch()
            assert "died" in str(exc_info.value.__cause__)
        finally:
            loader.shutdown()

    def test_four_workers_deterministic_vs_one(self, synth_dataset):
        """Order restoration makes the surfaced batch stream byte-identical
        for ANY worker count — 4 workers (on this 1-core host they timeshare,
        which maximizes out-of-order completion) must reproduce the 1-worker
        stream batch for batch."""
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()

        def take(num_workers, n):
            loader = MultiprocessTrainingLoader(
                cfg, roidb, batch_images=2, num_workers=num_workers,
                queue_capacity=3,
            ).start()
            try:
                return [loader.get_next_batch() for _ in range(n)]
            finally:
                loader.shutdown()

        ref = take(1, 6)
        four = take(4, 6)
        for a, b in zip(ref, four):
            assert set(a) == set(b)
            np.testing.assert_array_equal(a["data_u8"], b["data_u8"])
            np.testing.assert_array_equal(a["fg_num"], b["fg_num"])
            for lvl in cfg.fpn_levels():
                np.testing.assert_array_equal(a["labels"][lvl], b["labels"][lvl])

    def test_kill9_mid_epoch_propagates_no_hang(self, synth_dataset):
        """SIGKILL one of 4 workers while the loader is live: the consumer
        must get a RuntimeError (dead-worker detection via the seq hole +
        liveness probe), not hang — the analogue of the reference
        coordinator's abort semantics (lib/utils/coordinator.py:32-66)."""
        import os
        import signal
        import time

        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        loader = MultiprocessTrainingLoader(
            cfg, roidb, batch_images=2, num_workers=4, queue_capacity=2,
        ).start()
        try:
            loader.get_next_batch()  # loader demonstrably live
            os.kill(loader._procs[0].pid, signal.SIGKILL)
            deadline = time.monotonic() + 60.0
            with pytest.raises(RuntimeError) as exc_info:
                while time.monotonic() < deadline:
                    loader.get_next_batch()
                pytest.fail("no error surfaced within 60s of SIGKILL")
            assert "died" in str(exc_info.value.__cause__)
        finally:
            loader.shutdown()

    def test_propagates_worker_errors(self, synth_dataset):
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        cfg = tiny_train_cfg()
        ds = CocoDataset(synth_dataset)
        roidb = ds.get_roidb()
        for e in roidb:
            e["image"] = "/nonexistent/path.jpg"
        loader = MultiprocessTrainingLoader(
            cfg, roidb, batch_images=2, num_workers=1,
        ).start()
        try:
            with pytest.raises(RuntimeError):
                loader.get_next_batch()
        finally:
            loader.shutdown()


class TestDeviceNormalizeMode:
    def test_u8_batch_matches_f32_batch_exactly(self, synth_dataset):
        """DATA_LOADER.DEVICE_NORMALIZE ships one uint8 canvas; normalizing
        it on device (per stream, padding masked to 0) must reproduce the
        host-normalized f32 blobs bit-for-bit."""
        import jax.numpy as jnp

        from sad_tpu.ops.image_norm import normalize_u8_on_device

        cfg = tiny_train_cfg(distill=True)
        teacher_cfg = merge_cfg_from_dict(
            tiny_train_cfg(), {"PIXEL_MEANS": (0.0, 0.0, 0.0)}
        )
        ds = CocoDataset(synth_dataset)
        roidb = [e for e in ds.get_roidb() if e["width"] >= e["height"]][:2]
        b_f32 = RetinaNetMinibatchBuilder(
            cfg, teacher_cfg, device_normalize=False
        ).build(roidb, seed=4)
        b_u8 = RetinaNetMinibatchBuilder(
            cfg, teacher_cfg, device_normalize=True
        ).build(roidb, seed=4)
        assert b_u8.data_u8.dtype == np.uint8
        s = normalize_u8_on_device(
            jnp.asarray(b_u8.data_u8), cfg.PIXEL_MEANS, cfg.PIXEL_DIV,
            cfg.PIXEL_STD, content_hw=jnp.asarray(b_u8.content_hw),
        )
        t = normalize_u8_on_device(
            jnp.asarray(b_u8.data_u8), teacher_cfg.PIXEL_MEANS,
            teacher_cfg.PIXEL_DIV, teacher_cfg.PIXEL_STD,
            content_hw=jnp.asarray(b_u8.content_hw),
        )
        np.testing.assert_array_equal(np.asarray(s), b_f32.data)
        np.testing.assert_array_equal(np.asarray(t), b_f32.teacher_data)
        # anchor labels identical regardless of the storage mode
        for lvl in cfg.fpn_levels():
            np.testing.assert_array_equal(
                b_u8.labels[lvl], b_f32.labels[lvl]
            )

    def test_train_step_accepts_u8_batch(self, synth_dataset):
        """One joint distillation step on a u8 batch == the same step on the
        equivalent f32 batch (params and metrics)."""
        import jax
        import jax.numpy as jnp

        from tests.test_model_and_train import tiny_arch, tiny_cfg
        from sad_tpu.models import RetinaNet
        from sad_tpu.models.model_builder import init_model_params
        from sad_tpu.train import (
            TrainState,
            init_momentum_state,
            make_train_step,
        )

        cfg = tiny_cfg(n_groups=1)
        teacher_cfg = merge_cfg_from_dict(cfg, {"PIXEL_MEANS": (0.0, 0.0, 0.0)})
        arch = tiny_arch()
        student, teacher = RetinaNet(arch), RetinaNet(arch)
        H = W = 128
        sp = init_model_params(student, jax.random.PRNGKey(0), (1, H, W, 3))
        tp = init_model_params(teacher, jax.random.PRNGKey(1), (1, H, W, 3))
        rng = np.random.RandomState(0)
        a = arch.num_anchors
        u8 = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)
        content = np.asarray([[H, W], [96, 112]], np.float32)
        u8[1, 96:] = 0
        u8[1, :, 112:] = 0

        from sad_tpu.data.minibatch import normalize_image

        f32 = np.zeros((2, H, W, 3), np.float32)
        t32 = np.zeros((2, H, W, 3), np.float32)
        for i, (h, w) in enumerate(content.astype(int)):
            f32[i, :h, :w] = normalize_image(
                u8[i, :h, :w], cfg.PIXEL_MEANS, cfg.PIXEL_DIV, cfg.PIXEL_STD
            )
            t32[i, :h, :w] = normalize_image(
                u8[i, :h, :w], teacher_cfg.PIXEL_MEANS, teacher_cfg.PIXEL_DIV,
                teacher_cfg.PIXEL_STD,
            )

        common = {"labels": {}, "bbox_targets": {}, "fg_mask": {},
                  "fg_num": np.asarray([5.0], np.float32)}
        for lvl in cfg.fpn_levels():
            s_ = 2 ** lvl
            h_, w_ = H // s_, W // s_
            common["labels"][lvl] = rng.randint(-1, 5, (2, h_, w_, a)).astype(np.int32)
            common["bbox_targets"][lvl] = rng.randn(2, h_, w_, a, 4).astype(np.float32)
            common["fg_mask"][lvl] = rng.uniform(size=(2, h_, w_, a)) < 0.05

        step = jax.jit(make_train_step(
            cfg, student, teacher, n_groups=1, teacher_cfg=teacher_cfg
        ))
        out = {}
        for name, extra in (
            ("u8", {"data_u8": u8, "content_hw": content}),
            ("f32", {"data": f32, "teacher_data": t32}),
        ):
            batch = dict(common, **extra)
            state = TrainState(sp, init_momentum_state(sp).velocity)
            new_state, metrics = step(state, tp, batch, jnp.float32(0.01))
            out[name] = (new_state, metrics)
        for k in out["f32"][1]:
            np.testing.assert_array_equal(
                np.asarray(out["u8"][1][k]), np.asarray(out["f32"][1][k]),
                err_msg=k,
            )
