#!/usr/bin/env python
"""Training entry point (reference: /root/reference/src/testTrain.py).

    python tools/train.py stereo --data_dir data --batch_size 16 \
        --num_epochs 70 --lr_step 45,60 --uncert
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honour JAX_PLATFORMS even though this image's sitecustomize pre-imports
# jax with the axon TPU backend pinned
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from side_tpu.config import Config
from side_tpu.data.dataset import StereoKitti
from side_tpu.data.loader import Loader
from side_tpu.models import create_model
from side_tpu.models.stereo_net import init_stereo_net
from side_tpu.runtime.logger import Logger
from side_tpu.runtime.trainer import Trainer


def main(cfg: Config):
    if cfg.distributed:
        from side_tpu.parallel.mesh import init_distributed
        init_distributed(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")
    logger = Logger(cfg)
    np.random.seed(cfg.seed + 13 * jax.process_index())

    train_ds = StereoKitti(cfg, "train")
    val_ds = StereoKitti(cfg, "val")
    # per-process local batch; each host draws an independent shuffle stream
    local_bs = max(1, cfg.batch_size // jax.process_count())
    train_loader = Loader(train_ds, local_bs, shuffle=True,
                          num_workers=cfg.num_workers, drop_last=True,
                          seed=cfg.seed + 13 * jax.process_index())
    val_loader = Loader(val_ds, 1, shuffle=False, num_workers=1)

    print("Creating model...")
    model = create_model(cfg)
    variables = jax.jit(functools.partial(
        init_stereo_net, model, input_h=cfg.input_h, input_w=cfg.input_w,
        max_objs=cfg.max_objs))(jax.random.PRNGKey(cfg.seed))

    trainer = Trainer(cfg, model, variables,
                      steps_per_epoch=len(train_loader))
    start_epoch = 0
    if cfg.load_model:
        start_epoch = trainer.load(cfg.load_model, resume=cfg.resume)
    elif cfg.resume:
        path = os.path.join(cfg.save_dir, "model_last.npz")
        if os.path.exists(path):
            start_epoch = trainer.load(path, resume=True)

    print("Starting training...")
    best = 1e10
    for epoch in range(start_epoch + 1, cfg.num_epochs + 1):
        mark = epoch if cfg.save_all else "last"
        log_train = trainer.train(epoch, train_loader, logger)
        logger.write(f"epoch: {epoch} |")
        for k, v in log_train.items():
            logger.scalar_summary(f"train_{k}", v, epoch)
            logger.write(f"{k} {v:8f} | ")
        if cfg.val_intervals > 0 and epoch % cfg.val_intervals == 0:
            trainer.save(os.path.join(cfg.save_dir, f"model_{mark}.npz"),
                         epoch)
            log_val = trainer.val(epoch, val_loader, logger)
            for k, v in log_val.items():
                logger.scalar_summary(f"val_{k}", v, epoch)
                logger.write(f"{k} {v:8f} | ")
            if log_val[cfg.metric] < best:
                best = log_val[cfg.metric]
                trainer.save(os.path.join(cfg.save_dir, "model_best.npz"),
                             epoch)
        else:
            trainer.save(os.path.join(cfg.save_dir, "model_last.npz"), epoch)
        logger.write("\n")
        if epoch in cfg.lr_step:
            trainer.save(os.path.join(cfg.save_dir, f"model_{epoch}.npz"),
                         epoch)
    logger.close()


if __name__ == "__main__":
    main(Config.cli())
