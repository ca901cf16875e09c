"""Data-parallel evaluation over a device mesh.

Replaces the reference's sequential single-device eval loop + host-side
result accumulation (`SDNetTrainer.py:133-144`) with dp-sharded batches:
params replicate across the mesh, every batch tensor shards on its
question axis, XLA runs each eval step SPMD, and only the small [B, C]
score matrix is gathered to host for decoding (BASELINE.json config 5).
"""

from __future__ import annotations

from ruart_tpu.data.pipeline import device_put_batch
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.parallel.mesh import batch_pspec, replicate
from ruart_tpu.train.train_step import make_eval_step


def make_sharded_eval(
    model: RUArtModel,
    loss_fn,
    params,
    mesh,
):
    """Returns (eval_step, sharded_params, device_put) ready for
    ruart_tpu.eval.evaluator.evaluate: pass ``device_put`` so the prefetch
    thread lands every batch pre-sharded on the mesh."""
    eval_step = make_eval_step(model, loss_fn)
    sharded_params = replicate(params, mesh)
    sharding = batch_pspec(mesh)

    def device_put(batch):
        return device_put_batch(batch, sharding)

    return eval_step, sharded_params, device_put
