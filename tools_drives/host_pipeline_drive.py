"""Host-pipeline drive: minibatch-build throughput, cv2 vs numpy kernels.

Times RetinaNetMinibatchBuilder.build (distillation geometry: TRAIN.SCALES
600 / MAX_SIZE 1000, teacher stream, anchor labeling) over synthetic JPEGs
at realistic COCO sizes — a mix that exercises both the upscale (PIL) and
downscale (cv2/numpy) resize branches — with the cv2 delegation ON and then
forced OFF (the numpy-oracle fallback). Pure CPU; run on an otherwise idle
core. Ref throughput context: the reference feeds 8 GPUs with 4 cv2-backed
loader threads (lib/roi_data/loader.py:66-115).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/host_pipeline_drive.py
"""

import json
import os
import tempfile
import time

import numpy as np
from PIL import Image


def main():
    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import RetinaNetMinibatchBuilder
    import sad_tpu.data.minibatch as mb
    import sad_tpu.utils.segms as segms

    student_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-50-FPN_distillation.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", ""],
    )
    teacher_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-101-FPN_1x_teacher.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", ""],
    )

    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="host_pipe_")
    # realistic COCO landscape sizes: 480x640 (upscales to 600-short),
    # 768x1024 and 1200x1600 (downscale via the long-side cap)
    sizes = [(480, 640), (768, 1024), (1200, 1600), (500, 750)]
    entries = []
    for i, (h, w) in enumerate(sizes * 2):
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(p, quality=90)
        nb = 12
        x0 = rng.uniform(0, w * 0.7, nb)
        y0 = rng.uniform(0, h * 0.7, nb)
        boxes = np.stack(
            [x0, y0, x0 + rng.uniform(20, w * 0.3, nb),
             y0 + rng.uniform(20, h * 0.3, nb)], 1
        ).astype(np.float32)
        entries.append({
            "id": i + 1, "image": p, "width": w, "height": h,
            "flipped": i % 2 == 1, "boxes": boxes,
            "gt_classes": rng.randint(1, 81, nb).astype(np.int32),
            "is_crowd": np.zeros(nb, bool),
        })

    builder = RetinaNetMinibatchBuilder(student_cfg, teacher_cfg)

    def bench(label):
        for e in entries:  # warm the label-assignment caches
            builder.build([e, e], seed=0)
        n_iters = 10
        t0 = time.perf_counter()
        for it in range(n_iters):
            for j in range(0, len(entries), 2):
                builder.build(entries[j:j + 2], seed=it)
        dt = time.perf_counter() - t0
        n_imgs = n_iters * len(entries)
        r = {"config": label,
             "imgs_per_sec_per_core": round(n_imgs / dt, 2),
             "ms_per_2img_batch": round(dt / (n_iters * len(entries) / 2) * 1e3, 1)}
        print(json.dumps(r), flush=True)
        return r

    assert mb._cv2 is not None and segms._cv2 is not None, "cv2 not importable"
    with_cv2 = bench("cv2 delegation ON")
    mb._cv2 = segms._cv2 = None
    try:
        without = bench("numpy fallback (cv2 forced off)")
    finally:
        import cv2
        mb._cv2 = segms._cv2 = cv2
    print(json.dumps({
        "speedup": round(
            with_cv2["imgs_per_sec_per_core"] / without["imgs_per_sec_per_core"], 2
        )
    }))


if __name__ == "__main__":
    main()
