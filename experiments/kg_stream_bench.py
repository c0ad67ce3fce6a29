#!/usr/bin/env python
"""Single-chip KG link-prediction train step (KGLinkPredictor, GCN encoder)
at big-graph scale: spmm_backend xla vs stream on the same batch."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax

setup_jax({})

import jax
import jax.numpy as jnp

from kgcn_tpu.graph.batch import GraphBatch, set_dense_path
from kgcn_tpu.models.kg import KGLinkPredictor
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Batch, Trainer


def main(V=100_000, E=1_000_000, dim=128, L=1_000_000, iters=10):
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    g = GraphBatch(
        senders=jnp.asarray(s[None]),
        receivers=jnp.asarray(r[None]),
        edge_weights=jnp.asarray(w[None]),
        n_edge=jnp.asarray([E], jnp.int32),
        n_node=jnp.asarray([V], jnp.int32),
        node_mask=jnp.ones((V,), jnp.float32),
        node_ids=jnp.arange(V, dtype=jnp.int32),
        n_graph=1,
        max_nodes=V,
    )
    ll = np.zeros((L, 6), np.int32)
    ll[:, 0] = rng.randint(0, V, L)
    ll[:, 2] = rng.randint(0, V, L)
    ll[:, 3] = ll[:, 0]
    ll[:, 5] = rng.randint(0, V, L)
    ll = jnp.asarray(ll[None])

    cfg = default_config()
    cfg.update({"task": "link_prediction", "learning_rate": 0.01})
    set_dense_path(False)
    model = KGLinkPredictor(all_node_num=V, embedding_dim=dim, channels=1,
                            encoder="gcn")

    for backend in ("xla", "stream"):
        import importlib
        spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")
        spmm_mod.set_backend(backend)
        gg = g.with_stream() if backend == "stream" else g
        batch = Batch(graph=gg, label_list=ll)
        trainer = Trainer(model, cfg, None)
        state = trainer.init_state(batch, seed=0)
        state, c, _ = trainer.train_step(state, batch)
        state, c, _ = trainer.train_step(state, batch)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, c, m = trainer.train_step(state, batch)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / iters
        print(f"kg gcn-encoder train step [{backend}]: {dt*1e3:.1f} ms "
              f"({L/dt/1e6:.2f} M triples/s)", flush=True)
    spmm_mod.set_backend("xla")
    set_dense_path(True)


if __name__ == "__main__":
    main()
