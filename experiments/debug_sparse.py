import sys
import faulthandler
faulthandler.dump_traceback_later(120, repeat=True, file=open("/tmp/debug_sparse_stack.log", "w"))
sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax
setup_jax({})
import time

t0 = time.time()
LOG = open("/tmp/debug_sparse.log", "w")


def log(m):
    LOG.write(f"[{time.time()-t0:.0f}s] {m}\n")
    LOG.flush()


log("start")
import importlib

import numpy as np

import jax
import optax
from jax import lax

from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_random_graphs
from kgcn_tpu.graph.batch import set_dense_path
from kgcn_tpu.models.sparse import SparseGCN
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer

spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")
log(f"imports done, backend={jax.default_backend()}")
cfg = default_config()
cfg.update({"task": "classification", "learning_rate": 1e-3})
B, N, F = (int(v) for v in (sys.argv[1:4] or [16, 512, 81]))
data = make_random_graphs(B, N, F, avg_degree=8, seed=0)
log("data made")
ds, info = build_dataset(data, cfg)
set_dense_path(False)
spmm_mod.set_backend("xla")
b = Batcher(ds, info, B, seed=0)
log("batcher made")
batch = b.make_batch(np.arange(B))
log(f"batch made (ell={batch.graph.ell_senders is not None})")
model = SparseGCN(channels=info.adj_channel_num, num_classes=1000)
trainer = Trainer(model, cfg, info)
state = trainer.init_state(batch, seed=0)
log("init_state done")
state2, cost, m = trainer.train_step(state, batch)
jax.block_until_ready(cost)
log(f"xla train_step done cost={float(cost):.3f}")

spmm_mod.set_backend("tiled")
b2 = Batcher(ds, info, B, seed=0)
batch2 = b2.make_batch(np.arange(B))
ta = batch2.graph.tiled_adj
log(f"tiled batch made (chunks={ta[0].meta.n_chunks}, "
    f"tiling=({ta[0].meta.ts},{ta[0].meta.tr},{ta[0].meta.chunk}))")
trainer2 = Trainer(model, cfg, info)
state_t = trainer2.init_state(batch2, seed=0)
log("tiled init_state done")
s2, cost_t, m = trainer2.train_step(state_t, batch2)
jax.block_until_ready(cost_t)
log(f"tiled train_step done cost={float(cost_t):.3f}")
spmm_mod.set_backend("xla")
log("ALL OK")
