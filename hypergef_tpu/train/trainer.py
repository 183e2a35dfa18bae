"""Full-batch training loop with the reference's protocol.

Parity with ``HyperGsys/hgsys.py:146-211``: Adam(lr=0.01, weight-decay
5e-4, L2-in-gradient like torch.optim.Adam), ``nll_loss`` on the train
split, 10 warm-up iterations then ``epochs`` timed iterations, separate
timed inference loop, accuracy on train/test splits.  Timing uses
``jax.block_until_ready`` (the TPU analogue of the reference's
``torch.cuda.synchronize`` bracketing).

The whole train step — forward, loss, backward, Adam update — is a
single jitted function; XLA fuses the elementwise chains around the
aggregation kernels (the reference needs its fused CUDA op for this; on
TPU the op-level fusion is the compiler's job, the hypergraph aggregation
is ours).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hypergef_tpu.models.zoo import build_model
from hypergef_tpu.train.splits import accuracy


@dataclasses.dataclass
class TrainConfig:
    """Typed replacement for the reference's argparse namespace
    (``hgsys.py:22-70``) — same knobs, plus backend/mesh options."""

    model: str = "HGNN"
    nhid: int = 32
    nlayer: int = 2
    nhead: int = 1
    first_aggr: str = "sum"
    dropout: float = 0.6
    input_drop: float = 0.6
    activation: str = "relu"
    lr: float = 0.01
    wd: float = 5e-4
    epochs: int = 200
    warmup: int = 10
    seed: int = 1
    train_prop: float = 0.5
    valid_prop: float = 0.25
    backend: Optional[str] = "auto"  # auto → plan-preferred (dense|tree)
    # measured autotune (sparse/autotune.py): replace the static ladder
    # with a per-graph measured sweep, persisted across processes (the
    # reference's partition_dict analogue, hypergraph.py:74-77 — but
    # measured on THIS device, not hard-coded).  Cold first run; instant
    # after (cache keyed by graph shape + feature width + device kind).
    tune: bool = False
    # persistent plan cache directory (sparse/plancache.py): build the
    # schedule once per graph CONTENT, reuse across processes — the
    # reference's processed-dataset ``.pt`` cache analogue, at the plan
    # level where our front-loaded cost actually lives (aligned band
    # tables: ~13 s at 10M nnz).  None = off; "" = default user dir.
    plan_cache: Optional[str] = None


def make_optimizer(lr: float, wd: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay=wd) equivalent: L2 added to the
    gradient *before* the Adam moments (not decoupled AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(),
        optax.scale(-lr),
    )


class Trainer:
    def __init__(self, cfg: TrainConfig, hg, x, y, nclass: Optional[int] = None, plan=None):
        self.cfg = cfg
        self.hg = hg
        self.plan = plan
        if plan is None and cfg.tune:
            from hypergef_tpu.sparse.autotune import autotune_plan

            # the aggregation's steady-state feature width is nhid (the
            # hidden layers dominate; layer 1 runs once at nfeat)
            self.plan = autotune_plan(hg, feature_size=cfg.nhid)
        elif plan is None and cfg.backend not in ("xla", "cumsum"):
            with_tile = cfg.backend in ("ell", "pallas")
            if cfg.plan_cache is not None:
                from hypergef_tpu.sparse.plancache import cached_plan_aggregation

                self.plan = cached_plan_aggregation(
                    hg, cache_dir=cfg.plan_cache or None, with_tile=with_tile
                )
            else:
                from hypergef_tpu.sparse.planner import plan_aggregation

                self.plan = plan_aggregation(hg, with_tile=with_tile)
        self.hgd = hg.device_data()
        self.x = jnp.asarray(x, dtype=jnp.float32)
        self.y = jnp.asarray(y, dtype=jnp.int32)
        self.nclass = int(nclass if nclass is not None else int(np.asarray(y).max()) + 1)
        self.model = build_model(
            cfg.model,
            nfeat=self.x.shape[1],
            nhid=cfg.nhid,
            nclass=self.nclass,
            nlayer=cfg.nlayer,
            first_aggr=cfg.first_aggr,
            nhead=cfg.nhead,
            dropout=cfg.dropout,
            input_drop=cfg.input_drop,
            activation=cfg.activation,
            backend=cfg.backend,
        )
        rng = jax.random.key(cfg.seed)
        self.params = self.model.init(
            {"params": rng}, self.x, self.hgd, self.plan, deterministic=True
        )["params"]
        self.tx = make_optimizer(cfg.lr, cfg.wd)
        self.opt_state = self.tx.init(self.params)
        self._train_step = self._build_train_step()
        self._forward = self._build_forward()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, hgd, plan, tx = self.model, self.hgd, self.plan, self.tx

        # x/y enter as jit ARGUMENTS, not closure constants: captured
        # device arrays are baked into the compile body, and on the
        # tunneled backend the remote-compile HTTP request rejects
        # bodies >~200 MB (wide-feature graphs like yelp: 50758x1862
        # floats = 378 MB).  The incidence/plan tables stay captured —
        # they are the part XLA specializes the schedule on.
        def loss_fn(params, rng, train_idx, x, y):
            z = model.apply(
                {"params": params},
                x,
                hgd,
                plan,
                deterministic=False,
                rngs={"dropout": rng},
            )
            logp = jnp.take(z, train_idx, axis=0)
            yy = jnp.take(y, train_idx)
            nll = -jnp.mean(jnp.take_along_axis(logp, yy[:, None], axis=1))
            return nll

        @jax.jit
        def step(params, opt_state, rng, train_idx, x, y):
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, sub, train_idx, x, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss

        return step

    def _build_forward(self):
        model, hgd, plan = self.model, self.hgd, self.plan

        @jax.jit
        def forward(params, x):
            return model.apply({"params": params}, x, hgd, plan, deterministic=True)

        return forward

    # ------------------------------------------------------------------
    def fit(self, train_idx, epochs: Optional[int] = None, warmup: Optional[int] = None) -> Dict[str, Any]:
        """Warm-up + timed training epochs (protocol of hgsys.py:162-195)."""
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        warmup = cfg.warmup if warmup is None else warmup
        train_idx = jnp.asarray(np.asarray(train_idx), dtype=jnp.int32)
        rng = jax.random.key(cfg.seed + 1)
        params, opt_state = self.params, self.opt_state
        loss = jnp.zeros(())
        for _ in range(warmup):
            params, opt_state, rng, loss = self._train_step(
                params, opt_state, rng, train_idx, self.x, self.y
            )
        float(loss)  # true device fence (block_until_ready is unreliable
        # on the tunneled backend — see utils/timing.sync)
        t0 = time.perf_counter()
        for _ in range(epochs):
            params, opt_state, rng, loss = self._train_step(
                params, opt_state, rng, train_idx, self.x, self.y
            )
        float(loss)
        t1 = time.perf_counter()
        self.params, self.opt_state = params, opt_state
        return {
            "train_epoch_time_s": (t1 - t0) / max(epochs, 1),
            "final_loss": float(loss),
            "epochs": epochs,
        }

    def epoch_device_time(self, train_idx, iters: int = 50) -> float:
        """Pure device time per training epoch: chains ``iters`` full
        train steps (fwd+bwd+Adam) inside one jitted fori_loop, so host
        dispatch latency is excluded — the measurement protocol for
        kernel-honest comparisons (see docs/KERNEL_NOTES.md)."""
        return self._epoch_windows(train_idx, iters, windows=1, repeats=5)[0]

    def epoch_device_time_stats(
        self, train_idx, iters: int = 50, windows: int = 5, repeats: int = 3,
        min_window_s: float = 0.0,
    ) -> Dict[str, float]:
        """Per-epoch device time over ``windows`` independent differenced
        windows: median + spread.  The single-window protocol's noise
        floor is the size of the ~100 µs numbers it measures (VERDICT r3
        "weak" #3) — publishing median and [min, max] over ≥5 windows
        makes the spread part of the artifact instead of a
        session-to-session surprise.

        ``min_window_s`` applies the autotuner's min-window rule to the
        e2e leg: a pilot window estimates the per-epoch time, and if the
        differenced window holds less than ``min_window_s`` of device
        compute, ``iters`` is widened so dispatch jitter (multi-ms on a
        tunneled chip) amortizes below the stated spread instead of
        being the spread."""
        if min_window_s > 0:
            pilot = self._epoch_windows(train_idx, iters, 1, repeats)[0]
            if pilot > 0 and pilot * iters < min_window_s:
                iters = int(np.ceil(min_window_s / pilot))
        samples = self._epoch_windows(train_idx, iters, windows, repeats)
        arr = sorted(samples)
        n = len(arr)
        med = arr[n // 2] if n % 2 else 0.5 * (arr[n // 2 - 1] + arr[n // 2])
        return {
            "median_s": med,
            "min_s": arr[0],
            "max_s": arr[-1],
            "windows": n,
            "iters": iters,
            "samples_s": samples,
        }

    def _epoch_windows(self, train_idx, iters, windows, repeats):
        import time

        cfg = self.cfg
        train_idx = jnp.asarray(np.asarray(train_idx), dtype=jnp.int32)
        model, hgd, plan, tx = self.model, self.hgd, self.plan, self.tx

        def one_step(carry, rng_key, x, y):
            params, opt_state = carry

            def loss_fn(p, rng):
                z = model.apply(
                    {"params": p}, x, hgd, plan, deterministic=False,
                    rngs={"dropout": rng},
                )
                logp = jnp.take(z, train_idx, axis=0)
                yy = jnp.take(y, train_idx)
                return -jnp.mean(jnp.take_along_axis(logp, yy[:, None], axis=1))

            loss, grads = jax.value_and_grad(loss_fn)(params, rng_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def run(params, opt_state, x, y, n):
            def body(i, carry):
                (p, o), _ = one_step(carry[0], jax.random.fold_in(jax.random.key(0), i), x, y)
                return ((p, o), 0.0)
            (p, o), _ = jax.lax.fori_loop(0, n, body, ((params, opt_state), 0.0))
            return p

        from hypergef_tpu.utils.timing import sync

        f = jax.jit(run, static_argnums=4)
        sync(f(self.params, self.opt_state, self.x, self.y, 1))
        sync(f(self.params, self.opt_state, self.x, self.y, iters + 1))

        def timed(n):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                sync(f(self.params, self.opt_state, self.x, self.y, n))
                best = min(best, time.perf_counter() - t0)
            return best

        samples = []
        for _ in range(max(windows, 1)):
            t_short = timed(1)
            t_long = timed(iters + 1)
            samples.append(max(t_long - t_short, 0.0) / iters)
        return samples

    def evaluate(self, split_idx) -> Dict[str, float]:
        z = np.asarray(self._forward(self.params, self.x))
        y = np.asarray(self.y)
        out = {}
        for name, idx in split_idx.items():
            idx = np.asarray(idx)
            if idx.size:
                out[f"{name}_acc"] = accuracy(z[idx], y[idx])
        return out

    def save(self, directory: str, step: int = 0, wait: bool = True) -> None:
        """Checkpoint (params, opt_state) via orbax (train.checkpoint)."""
        from hypergef_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(directory, step, self.params, self.opt_state, wait=wait)

    def restore(self, directory: str, step: Optional[int] = None) -> int:
        """Restore training state in place; returns the restored step."""
        from hypergef_tpu.train.checkpoint import restore_checkpoint

        step, self.params, self.opt_state = restore_checkpoint(
            directory, self.params, self.opt_state, step=step
        )
        return step

    def time_inference(self, iters: int = 200, warmup: int = 10) -> float:
        from hypergef_tpu.utils.timing import sync

        for _ in range(warmup):
            z = self._forward(self.params, self.x)
        sync(z)
        t0 = time.perf_counter()
        for _ in range(iters):
            z = self._forward(self.params, self.x)
        sync(z)
        t1 = time.perf_counter()
        return (t1 - t0) / iters


def train_full_batch(cfg: TrainConfig, hg, x, y, split_idx, nclass=None, plan=None):
    """One-call convenience mirroring the reference CLI run: returns
    timing + accuracy results dict (the CSV row of ``hgsys.py:207-211``)."""
    tr = Trainer(cfg, hg, x, y, nclass=nclass, plan=plan)
    res = tr.fit(split_idx["train"])
    res["inference_time_s"] = tr.time_inference(iters=max(cfg.epochs // 2, 1))
    res.update(tr.evaluate(split_idx))
    return res
