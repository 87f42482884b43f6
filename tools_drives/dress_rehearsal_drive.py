"""Chip drive: real-COCO parity DRESS REHEARSAL (VERDICT r2 item 2).

Real COCO and the released weights do not exist in this environment, so this
drive runs the complete reference workflow — through the REAL CLIs, with the
standard catalog names, at the largest honest stand-in scale — on a
generated multi-class COCO-format dataset:

  phase 1  train the teacher              (train_net --cfg teacher.yaml)
  phase 2  eval the teacher on val        (test_net)
  phase 3  teacher pseudo-labels the unlabeled split
           (test_net --pseudo-out .../pseudo_unlabeled2017_R101_600.json —
            the CATALOG name coco_2017_unlabel_R101_600 then resolves it,
            exactly as the real runbook would; dataset_catalog.py:201-218)
  phase 4  train the plain student        (+ the bf16-vs-f32 train/eval
           re-pin of VERDICT item 7: the same student config trained in
           both dtypes, both checkpoints eval'd in both dtypes)
  phase 5  distill the student from the frozen teacher over the mixed
           UNLABEL_DISTILLATION stream (pseudo + labeled, strict parity)
  phase 6  eval the distilled student; EXPECTED_RESULTS gate via reval
           (the measured AP is pinned and re-checked through the CLI gate)
  phase 7  SIGKILL a distillation run mid-training, rerun the same command,
           AUTO_RESUME must continue and produce a BIT-IDENTICAL
           model_final.pkl to phase 5's uninterrupted run

Dataset design note: synthetic objects must be anchor-matchable — at
ANCHOR_SCALE 4 the finest anchors (P3) are 32px, so objects below ~24px can
never reach the 0.5 IoU positive threshold and only dilute AP. The
rehearsal set draws radii 16..min(h,w)/3 with a 10% sprinkle of 8-16px
smalls (honest APs mass), plus crowd RLEs and ignore flags.

Everything runs through subprocesses of the real CLIs with
SAD_TPU_DATA_DIR pointing at the generated COCO layout — the same
environment contract a real-COCO run uses (docs/RUNBOOK_COCO.md).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/dress_rehearsal_drive.py
     [--smoke]   (tiny CPU smoke of the full phase graph)
     [--root D]  (resume: reuse an existing rehearsal dir, skipping every
                  phase whose final artifact already exists — the round-3
                  chip run died mid-phase-4 at end-of-round, and all configs
                  below are deterministic, so a rerun over the same root
                  picks up exactly where it stopped)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_yaml(path: str, doc: dict) -> str:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(doc, f)
    return path


def gen_coco_layout(root: str, n_train: int, n_val: int, n_unlabeled: int,
                    size_range) -> None:
    """Synthetic dataset in the standard COCO directory layout, so the
    UNMODIFIED catalog names (coco_2017_train/val/unlabel) resolve it."""
    from sad_tpu.data.synth_coco import generate_synthetic_coco

    coco = os.path.join(root, "coco")
    ann = os.path.join(coco, "annotations")
    os.makedirs(ann, exist_ok=True)
    gen = dict(size_range=size_range, objects_per_image=(2, 8),
               small_frac=0.1, crowd_frac=0.05, ignore_frac=0.03)

    def place(split, n, seed, labeled=True):
        img_dir, j = generate_synthetic_coco(
            coco, split, n, seed=seed, labeled=labeled, **gen
        )
        os.rename(img_dir, os.path.join(coco, f"{split}2017"))
        target = (
            f"instances_{split}2017.json" if labeled
            else f"image_info_{'unlabeled' if split == 'unlabeled' else split}2017.json"
        )
        os.rename(j, os.path.join(ann, target))

    place("train", n_train, seed=0)
    place("val", n_val, seed=1)
    place("unlabeled", n_unlabeled, seed=2, labeled=False)


def run_cli(env, module, args, log_path, kill_when=None, kill_grace_s=8.0):
    """Run a real CLI in a subprocess. With kill_when (a predicate), poll
    until it turns true, wait kill_grace_s more (so the kill lands mid-run,
    strictly after the snapshot that made the predicate true), then SIGKILL."""
    cmd = [sys.executable, "-m", module] + args
    with open(log_path, "a") as log:
        log.write(f"\n$ {' '.join(cmd)}\n")
        log.flush()
        p = subprocess.Popen(cmd, env=env, stdout=log, stderr=log)
        if kill_when is None:
            rc = p.wait()
            if rc != 0:
                print(open(log_path).read()[-4000:])
                raise RuntimeError(f"{module} {args[:4]} -> rc {rc}")
            return rc
        while p.poll() is None:
            if kill_when():
                time.sleep(kill_grace_s)
                break
            time.sleep(2.0)
        if p.poll() is not None:
            # finished before the kill landed — still a valid (degenerate)
            # resume test: the rerun must be a no-op on model_final
            return p.returncode
        p.send_signal(signal.SIGKILL)
        p.wait()
        return -9


def load_results(out_dir, dataset):
    with open(os.path.join(out_dir, "test", dataset, "results.json")) as f:
        return json.load(f)


def ckpt_params(path):
    with open(path, "rb") as f:
        return pickle.load(f)["params"]


def tree_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke of the full phase graph")
    ap.add_argument("--root", default=None,
                    help="resume over an existing rehearsal dir")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--train-images", type=int, default=512)
    ap.add_argument("--val-images", type=int, default=256)
    ap.add_argument("--unlabeled-images", type=int, default=256)
    args = ap.parse_args()
    if args.smoke:
        args.iters = 8
        args.train_images = args.val_images = args.unlabeled_images = 8

    root = args.root or tempfile.mkdtemp(prefix="rehearsal_")
    size_range = (80, 120) if args.smoke else (260, 460)
    scales = (64,) if args.smoke else (320,)
    max_size = 128 if args.smoke else 512
    t0 = time.perf_counter()
    if os.path.isdir(os.path.join(root, "coco", "annotations")):
        print(f"dataset: reusing {root}", flush=True)
    else:
        gen_coco_layout(root, args.train_images, args.val_images,
                        args.unlabeled_images, size_range)
        print(f"dataset gen: {time.perf_counter() - t0:.0f}s -> {root}",
              flush=True)

    env = dict(os.environ)
    env["SAD_TPU_DATA_DIR"] = root
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    # hang forensics: SIGABRT on a wedged child dumps all Python thread
    # stacks into the CLI log (two tunnel hangs mid-distill, round 4)
    env["PYTHONFAULTHANDLER"] = "1"
    if args.smoke:
        env["JAX_PLATFORMS"] = "cpu"
    log = os.path.join(root, "drive.log")
    print("CLI log:", log, flush=True)

    common = {
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True,
                      "ASPECT_RATIOS": [0.5, 1.0, 2.0],
                      "SCALES_PER_OCTAVE": 3},
        # multi-scale train jitter like the reference keypoint 1x config
        # (TRAIN.SCALES draws per-batch; canvas pads to the max bucket)
        "TRAIN": {"SCALES": list(scales) if args.smoke else [288, 320],
                  "MAX_SIZE": max_size,
                  "IMS_PER_BATCH": 8 if not args.smoke else 2,
                  "DATASETS": ["coco_2017_train"],
                  "SNAPSHOT_ITERS": max(args.iters // 2, 2) * 2,
                  "WEIGHTS": ""},
        "TEST": {"SCALES": list(scales), "MAX_SIZE": max_size,
                 "DATASETS": ["coco_2017_val"], "SCORE_THRESH": 0.05},
        "SOLVER": {"BASE_LR": 0.002, "MAX_ITER": args.iters,
                   "WARM_UP_ITERS": max(args.iters // 8, 1),
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1,
                   "STEPS": [0, int(args.iters * 0.8)]},
        "PIXEL_STD": [57.375, 57.12, 58.395],
        "COMPUTE_DTYPE": "bfloat16",
    }

    def model_doc(num_classes=9, ratio=0.5, extra=None):
        doc = json.loads(json.dumps(common))  # deep copy
        doc["MODEL"] = {"TYPE": "retinanet", "NUM_CLASSES": num_classes,
                        "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"}
        doc["RESNETS"] = {"CHANNEL_RATIO": ratio}
        if extra:
            for k, v in extra.items():
                if isinstance(v, dict):
                    doc[k] = {**doc.get(k, {}), **v}
                else:
                    doc[k] = v
        return doc

    # ---------------- phase 1+2: teacher (deeper trunk), train + eval
    teacher_out = os.path.join(root, "teacher")
    teacher_yaml = _write_yaml(os.path.join(root, "teacher.yaml"), model_doc(
        ratio=0.5, extra={"OUTPUT_DIR": teacher_out,
                          "RESNETS": {"CHANNEL_RATIO": 0.5}},
    ))
    teacher_ckpt = os.path.join(teacher_out, "train", "coco_2017_train",
                                "model_final.pkl")
    if os.path.exists(teacher_ckpt):
        print("phase1 teacher train: SKIP (checkpoint exists)", flush=True)
    else:
        t0 = time.perf_counter()
        run_cli(env, "sad_tpu.tools.train_net",
                ["--cfg", teacher_yaml, "--skip-test"], log)
        print(f"phase1 teacher train: {time.perf_counter() - t0:.0f}s",
              flush=True)
    assert os.path.exists(teacher_ckpt)

    if not os.path.exists(os.path.join(teacher_out, "test", "coco_2017_val",
                                       "results.json")):
        run_cli(env, "sad_tpu.tools.test_net",
                ["--cfg", teacher_yaml, "TEST.WEIGHTS", teacher_ckpt,
                 "OUTPUT_DIR", teacher_out], log)
    r_teacher = load_results(teacher_out, "coco_2017_val")
    print("phase2 teacher AP:", r_teacher["AP"], flush=True)

    # ---------------- phase 3: pseudo-label the unlabeled split via CLI,
    # writing to the CATALOG's expected location
    pseudo_json = os.path.join(root, "coco", "annotations",
                               "pseudo_unlabeled2017_R101_600.json")
    t0 = time.perf_counter()
    if os.path.exists(pseudo_json):
        print("phase3 pseudo-gen: SKIP (json exists)", flush=True)
    else:
        run_cli(env, "sad_tpu.tools.test_net",
                ["--cfg", teacher_yaml, "--pseudo-out", pseudo_json,
                 "--pseudo-score-thresh", "0.35",
                 "TEST.WEIGHTS", teacher_ckpt,
                 "TEST.DATASETS", "('coco_2017_unlabel',)",
                 "OUTPUT_DIR", os.path.join(root, "pseudo_run")], log)
    with open(pseudo_json) as f:
        pseudo = json.load(f)
    print(f"phase3 pseudo-gen: {time.perf_counter() - t0:.0f}s, "
          f"{len(pseudo['annotations'])} annotations", flush=True)
    if not args.smoke:
        assert len(pseudo["annotations"]) >= args.unlabeled_images // 4

    # ---------------- phase 4: plain student, bf16 AND f32 (item 7 re-pin)
    student_ap = {}
    for dtype in ("bfloat16", "float32"):
        out = os.path.join(root, f"student_plain_{dtype}")
        y = _write_yaml(os.path.join(root, f"student_{dtype}.yaml"), model_doc(
            ratio=0.25,
            extra={"OUTPUT_DIR": out, "COMPUTE_DTYPE": dtype, "RNG_SEED": 7},
        ))
        ckpt = os.path.join(out, "train", "coco_2017_train", "model_final.pkl")
        if os.path.exists(ckpt):
            print(f"phase4 student[{dtype}] train: SKIP (checkpoint exists)",
                  flush=True)
        else:
            t0 = time.perf_counter()
            run_cli(env, "sad_tpu.tools.train_net",
                    ["--cfg", y, "--skip-test"], log)
            print(f"phase4 student[{dtype}] train: "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        for eval_dtype in ("bfloat16", "float32"):
            if not os.path.exists(os.path.join(
                    out + f"_eval_{eval_dtype}", "test", "coco_2017_val",
                    "results.json")):
                run_cli(env, "sad_tpu.tools.test_net",
                        ["--cfg", y, "TEST.WEIGHTS", ckpt,
                         "COMPUTE_DTYPE", eval_dtype,
                         "OUTPUT_DIR", out + f"_eval_{eval_dtype}"], log)
            r = load_results(out + f"_eval_{eval_dtype}", "coco_2017_val")
            student_ap[f"train_{dtype}_eval_{eval_dtype}"] = r["AP"]
    print("phase4 dtype matrix:", json.dumps(student_ap), flush=True)

    # ---------------- phase 5: distillation over the mixed unlabeled stream
    distill_out = os.path.join(root, "distill")
    teacher_frozen_yaml = _write_yaml(
        os.path.join(root, "teacher_frozen.yaml"),
        model_doc(ratio=0.5, extra={"TRAIN": {"WEIGHTS": teacher_ckpt}}),
    )
    distill_doc = model_doc(ratio=0.25, extra={
        "MODEL": {"TYPE": "distillation"},
        "OUTPUT_DIR": distill_out,
        "RNG_SEED": 7,
        # snapshots make the PHASE hang-resumable (two tunnel wedges hit
        # mid-distill in round 4; AUTO_RESUME + bit-identical resume means
        # a babysitter relaunch continues instead of restarting); snapshot
        # cadence does not perturb training (see the phase-7 note below)
        "TRAIN": {"SNAPSHOT_ITERS": max(args.iters // 6, 2)},
        "DISTILLATION": {
            "DISTILLATION_ON": True, "LOSS_ALPHA": 0.5, "LOSS_GAMMA": 2.0,
            "ADAPTIVE_NORMALIZER": True, "LOGITS_POWER": 1.8,
            "TEMPERATURE": 1.0, "UNLABEL_DISTILLATION": True,
            "UNLABEL_DATASETS": ["coco_2017_unlabel_R101_600",
                                 "coco_2017_train"],
        },
    })
    distill_yaml = _write_yaml(os.path.join(root, "distill.yaml"), distill_doc)
    distill_ckpt = os.path.join(distill_out, "train",
                                "coco_2017_train", "model_final.pkl")
    if os.path.exists(distill_ckpt):
        print("phase5 distill train: SKIP (checkpoint exists)", flush=True)
    else:
        t0 = time.perf_counter()
        run_cli(env, "sad_tpu.tools.train_net",
                ["--cfg", distill_yaml, "--teacher_cfg", teacher_frozen_yaml,
                 "--skip-test"], log)
        print(f"phase5 distill train: {time.perf_counter() - t0:.0f}s",
              flush=True)

    # ---------------- phase 6: eval + EXPECTED_RESULTS gate through the CLI
    if not os.path.exists(os.path.join(distill_out, "test", "coco_2017_val",
                                       "results.json")):
        run_cli(env, "sad_tpu.tools.test_net",
                ["--cfg", distill_yaml, "TEST.WEIGHTS", distill_ckpt,
                 "OUTPUT_DIR", distill_out], log)
    r_distill = load_results(distill_out, "coco_2017_val")
    print("phase6 distilled AP:", r_distill["AP"], flush=True)
    gate = [["coco_2017_val", "box", "AP", round(float(r_distill["AP"]), 4)]]
    run_cli(env, "sad_tpu.tools.test_net",
            ["--cfg", distill_yaml, "TEST.WEIGHTS", distill_ckpt,
             "EXPECTED_RESULTS", json.dumps(gate).replace(" ", ""),
             "OUTPUT_DIR", distill_out + "_gate"], log)
    print("phase6 EXPECTED_RESULTS gate: PASS", flush=True)

    # ---------------- phase 7: SIGKILL mid-distillation + AUTO_RESUME ->
    # bit-identical final checkpoint vs phase 5
    resume_out = os.path.join(root, "distill_resume")
    resume_doc = json.loads(json.dumps(distill_doc))
    resume_doc["OUTPUT_DIR"] = resume_out
    resume_doc["TRAIN"]["SNAPSHOT_ITERS"] = max(args.iters // 3, 2)
    resume_yaml = _write_yaml(os.path.join(root, "resume.yaml"), resume_doc)
    # Snapshot cadence differs from phase 5 (mid-run snapshots here), which
    # is fine: snapshots don't perturb training — only the batch/key
    # schedule matters, and both runs share RNG_SEED + the deterministic
    # loader.
    import glob as _glob

    killed_dir = os.path.join(resume_out, "train", "coco_2017_train")
    final_resumed = os.path.join(killed_dir, "model_final.pkl")

    def snapshot_exists():
        return bool(_glob.glob(os.path.join(killed_dir, "model_iter*.pkl")))

    if os.path.exists(final_resumed):
        print("phase7 kill+resume: SKIP (final exists)", flush=True)
    else:
        rc = run_cli(env, "sad_tpu.tools.train_net",
                     ["--cfg", resume_yaml, "--teacher_cfg",
                      teacher_frozen_yaml, "--skip-test"], log,
                     kill_when=snapshot_exists)
        snaps = _glob.glob(os.path.join(killed_dir, "model_iter*.pkl"))
        print(f"phase7 killed (rc {rc}); snapshots: "
              f"{[os.path.basename(s) for s in snaps]}", flush=True)
        run_cli(env, "sad_tpu.tools.train_net",
                ["--cfg", resume_yaml, "--teacher_cfg", teacher_frozen_yaml,
                 "--skip-test"], log)
    identical = tree_equal(ckpt_params(distill_ckpt),
                           ckpt_params(final_resumed))
    print("phase7 resume bit-identical to uninterrupted:", identical,
          flush=True)

    summary = {
        "teacher_AP": round(float(r_teacher["AP"]), 4),
        "pseudo_annotations": len(pseudo["annotations"]),
        "student_dtype_matrix": {k: round(float(v), 4)
                                 for k, v in student_ap.items()},
        "distilled_AP": round(float(r_distill["AP"]), 4),
        "distill_gain_vs_plain_bf16": round(
            float(r_distill["AP"])
            - float(student_ap["train_bfloat16_eval_bfloat16"]), 4),
        "resume_bit_identical": bool(identical),
        "expected_results_gate": "PASS",
    }
    print(json.dumps(summary))
    if not args.smoke:
        assert r_teacher["AP"] > 0.05, "teacher failed to learn"
        assert identical, "resume diverged from the uninterrupted run"
    else:
        assert identical, "resume diverged (smoke)"
    print("DRIVE OK", root)


if __name__ == "__main__":
    sys.exit(main())
