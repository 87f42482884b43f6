"""Convert checkpoints between sad_tpu and the reference blob format.

Capability-equivalent to the reference's model conversion tooling
(tools/pickle_caffe_blobs.py + utils/model_convert_utils.py): the reference
converted Caffe protobuf weights into Caffe2 blob pickles; sad_tpu consumes
those same blob pickles directly (they are the published-weights format), so
this tool covers both directions between blob pickles and native sad_tpu
checkpoints.

Usage:
  # reference blobs -> sad_tpu checkpoint (needs a cfg to shape the tree)
  python -m sad_tpu.tools.convert_weights --cfg cfg.yaml \
      --input R-50.pkl --output model.sadtpu.pkl

  # sad_tpu checkpoint -> reference blobs (for parity tooling)
  python -m sad_tpu.tools.convert_weights --cfg cfg.yaml --to-blobs \
      --input model.sadtpu.pkl --output blobs.pkl
"""

from __future__ import annotations

import argparse
import pickle

import jax

from sad_tpu.config import load_cfg
from sad_tpu.models import create_model
from sad_tpu.models.model_builder import init_model_params
from sad_tpu.train.checkpoint import (
    convert_reference_pickle,
    flax_to_reference_blobs,
    load_checkpoint,
    save_checkpoint,
)
from sad_tpu.utils.logging import setup_logging

logger = setup_logging("convert_weights")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--to-blobs", action="store_true")
    args = p.parse_args(argv)

    cfg = load_cfg(args.cfg_file)
    model = create_model(cfg)
    from sad_tpu.data.minibatch import canvas_shapes

    (h, w), _ = canvas_shapes(cfg)
    template = init_model_params(model, jax.random.PRNGKey(0), (1, h, w, 3))

    # flattening-FC kernels (fc6, USE_FC_OUTPUT mask head) need the
    # CHW<->HWC input-row permutation keyed by the RoI resolution — without
    # it the converted kernel has the right SHAPE but scrambled rows and
    # inference silently produces garbage (train_loop passes this too)
    from sad_tpu.train.checkpoint import fc_flatten_resolutions

    fc_res = fc_flatten_resolutions(cfg)

    if args.to_blobs:
        ck = load_checkpoint(args.input)
        blobs = flax_to_reference_blobs(ck["params"], fc_resolutions=fc_res)
        with open(args.output, "wb") as f:
            pickle.dump({"blobs": blobs}, f, pickle.HIGHEST_PROTOCOL)
        logger.info("Wrote %d blobs -> %s", len(blobs), args.output)
    else:
        params, loaded, skipped = convert_reference_pickle(
            args.input, template, fc_resolutions=fc_res
        )
        save_checkpoint(args.output, params, None, 0)
        logger.info(
            "Converted %s -> %s (loaded %d blobs, skipped %d params)",
            args.input, args.output, len(loaded), len(skipped),
        )
        for s in skipped[:20]:
            logger.info("  skipped: %s", s)


if __name__ == "__main__":
    main()
