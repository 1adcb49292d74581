"""Host-side trainers: PartI and PartII.

Replaces the reference Trainer classes
(``/root/reference/train/trainer.py:22-265``): step-loop with
exponential LR decay (inside the optax schedule), periodic validation
with best-checkpoint tracking (PartI: whole-set retrieval recall,
``loss_val.py:75-140``; PartII: mean quaternion angular error,
``loss_val.py:142-198``), rolling + best checkpoints with full state
(params, batch_stats, opt_state, step, best metric) — the analog of the
reference's ``{step,best_para,network_state_dict,optimizer_state_dict}``
dicts — serialized with flax msgpack.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from yoho_tpu.config import PipelineConfig
from yoho_tpu.train.losses import quaternion_angular_error_deg
from yoho_tpu.train.steps import (
    TrainState,
    init_train_state,
    make_optimizer,
    part1_train_step,
    part2_train_step,
)


def save_checkpoint(path: str, state: TrainState, best_para: float) -> None:
    payload = {
        "state": serialization.to_bytes(state),
        "best_para": best_para,
        "step": int(state.step),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def _read_payload(path: str) -> dict:
    """Read a checkpoint payload; transparently handles gzip-compressed
    release checkpoints (``scripts/export_release.py`` zeroes the
    optimizer moments and gzips the pickle so trained weights are small
    enough to commit)."""
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            import gzip

            with gzip.open(f) as gz:
                return pickle.load(gz)
        return pickle.load(f)


def _cast_like(tree, template):
    """Cast restored leaves to the template's dtypes: release checkpoints
    may be stored float16 (scripts/export_release.py halves the committed
    size); consumers always compute at the template precision."""
    return jax.tree.map(
        lambda a, t: jnp.asarray(a, getattr(t, "dtype", None))
        if hasattr(t, "dtype")
        else a,
        tree,
        template,
    )


def load_checkpoint(path: str, template: TrainState):
    """Load a full training (or release) checkpoint into a TrainState
    template.

    When the saved opt_state pytree doesn't match the template's (e.g.
    an adam-era checkpoint resumed under adamw after the weight_decay
    knob, or a cross-version release file), fall back to restoring
    params/batch_stats/step only and keep the template's fresh
    optimizer state — the same documented trade as release checkpoints
    (zeroed moments)."""
    payload = _read_payload(path)
    try:
        state = serialization.from_bytes(template, payload["state"])
    except (ValueError, KeyError, TypeError):
        raw = serialization.msgpack_restore(payload["state"])
        state = template._replace(
            params=serialization.from_state_dict(template.params, raw["params"]),
            batch_stats=serialization.from_state_dict(
                template.batch_stats, raw.get("batch_stats", {})
            ),
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )
        print(
            f"load_checkpoint: opt_state structure mismatch in {path}; "
            "restored params/batch_stats/step with a fresh optimizer",
            flush=True,
        )
    state = state._replace(
        params=_cast_like(state.params, template.params),
        batch_stats=_cast_like(state.batch_stats, template.batch_stats),
    )
    return state, payload["best_para"]


def load_inference_variables(path: str, variables: dict):
    """Restore only params/batch_stats from any checkpoint, without
    constructing an optimizer template (inference consumers: bench,
    simple API). ``variables`` is a ``model.init(...)`` dict used as the
    structure template."""
    payload = _read_payload(path)
    raw = serialization.msgpack_restore(payload["state"])
    out = {
        "params": _cast_like(
            serialization.from_state_dict(variables["params"], raw["params"]),
            variables["params"],
        )
    }
    if "batch_stats" in variables or raw.get("batch_stats"):
        out["batch_stats"] = _cast_like(
            serialization.from_state_dict(
                variables.get("batch_stats", {}), raw.get("batch_stats", {})
            ),
            variables.get("batch_stats", {}),
        )
    return out, payload["best_para"]


class BaseTrainer:
    part: str = "PartI"

    def __init__(self, cfg: PipelineConfig, model, model_dir: str):
        self.cfg = cfg
        self.model = model
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self.ckpt_fn = os.path.join(model_dir, "model.pkl")
        self.best_fn = os.path.join(model_dir, "model_best.pkl")
        self.log_fn = os.path.join(model_dir, "train.log")

    def _log(self, msg: str):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(self.log_fn, "a") as f:
            f.write(line + "\n")

    def fit(
        self,
        train_batches: Callable[[], Iterator[dict]],
        val_batches: Callable[[], Iterator[dict]],
        steps_per_epoch: int,
    ):
        cfg = self.cfg.train
        optimizer = make_optimizer(cfg, steps_per_epoch)
        state = self._init_state(optimizer)
        best_para = self._init_best()
        if os.path.exists(self.ckpt_fn):
            state, best_para = load_checkpoint(self.ckpt_fn, state)
            self._log(f"resumed step {int(state.step)} best {best_para}")

        step_fn = jax.jit(self._make_step(optimizer))
        total_steps = cfg.epochs * steps_per_epoch
        # The reference intervals (3k/6k steps, parses_partI.py:65-73)
        # assume reference-scale runs; clamp them so short runs still
        # log, validate and checkpoint instead of silently finishing
        # with no model_best.pkl.
        log_int = max(1, min(cfg.train_log_step, 500))
        val_int = max(1, min(cfg.val_interval, max(total_steps // 2, 1)))
        save_int = max(1, min(cfg.save_interval, val_int))
        # Optional wall-clock cap (like train_fcgf --max-seconds): caps a
        # stage against tunnel wedges / round budgets; the final
        # validation below still runs, so the last state competes.
        max_seconds = float(os.environ.get("YOHO_TRAIN_MAX_SECONDS", "0"))
        if not max_seconds and os.path.exists(".yoho_train_cap"):
            # file override: lets an operator cap an already-launched
            # stage pipeline without restarting it (env is baked in)
            with open(".yoho_train_cap") as f:
                max_seconds = float(f.read().strip() or 0)
        t0 = time.time()
        capped = False
        # Host-side step mirror + deferred metric readback: calling
        # float()/int() on device values every step would block the host
        # on each dispatch, serializing host prep with device compute
        # (the exact stall utils/prefetch.py exists to avoid). Losses
        # stay device arrays until a log boundary.
        step = int(state.step)
        running = []
        while step < total_steps and not capped:
            for batch in train_batches():
                if max_seconds and time.time() - t0 > max_seconds:
                    self._log(f"wall-clock cap {max_seconds:.0f}s at step {step}")
                    capped = True
                    break
                state, metrics = step_fn(state, batch)
                running.append(metrics["loss"])
                step += 1
                if step % log_int == 0:
                    loss = float(np.mean([float(x) for x in running]))
                    self._log(f"step {step}/{total_steps} loss {loss:.5f}")
                    running = []
                if step % val_int == 0:
                    para = self._validate(state, val_batches)
                    if self._is_better(para, best_para):
                        best_para = para
                        save_checkpoint(self.best_fn, state, best_para)
                        self._log(f"new best {best_para:.5f} @ step {step}")
                if step % save_int == 0:
                    save_checkpoint(self.ckpt_fn, state, best_para)
                if step >= total_steps:
                    break
        # final validation: guarantees model_best.pkl exists and the
        # last state competes (also runs when resuming a finished run)
        para = self._validate(state, val_batches)
        if self._is_better(para, best_para) or not os.path.exists(self.best_fn):
            best_para = para
            save_checkpoint(self.best_fn, state, best_para)
            self._log(f"final best {best_para:.5f} @ step {int(state.step)}")
        save_checkpoint(self.ckpt_fn, state, best_para)
        return state, best_para

    # --- subclass hooks ---
    def _init_state(self, optimizer) -> TrainState:
        raise NotImplementedError

    def _make_step(self, optimizer):
        raise NotImplementedError

    def _validate(self, state, val_batches) -> float:
        raise NotImplementedError

    def _init_best(self) -> float:
        raise NotImplementedError

    def _is_better(self, a, b) -> bool:
        raise NotImplementedError


class TrainerPartI(BaseTrainer):
    """Best = max whole-set retrieval recall (trainer.py:119-127)."""

    part = "PartI"

    def __init__(self, cfg, model, model_dir, example_batch):
        super().__init__(cfg, model, model_dir)
        self.example = example_batch

    def _init_state(self, optimizer):
        variables = self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed), self.example["feats0"], False
        )
        return init_train_state(variables, optimizer)

    def _make_step(self, optimizer):
        model, cfg = self.model, self.cfg.train
        return lambda s, b: part1_train_step(model, optimizer, cfg, s, b)

    def _init_best(self):
        return 0.0

    def _is_better(self, a, b):
        return a >= b

    def _validate(self, state, val_batches) -> float:
        model = self.model
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def fwd(feats):
            return model.apply(variables, feats, False)["inv"]

        inv0_all, inv1_all = [], []
        for batch in val_batches():
            inv0_all.append(np.asarray(fwd(batch["feats0"])))
            inv1_all.append(np.asarray(fwd(batch["feats1"])))
        inv0 = np.concatenate(inv0_all)
        inv1 = np.concatenate(inv1_all)
        # whole-set retrieval recall (loss_val.py:80-88 / :131-135)
        d = ((inv0[None, :, :] - inv1[:, None, :]) ** 2).sum(-1)
        recall = float((d.argmin(1) == np.arange(len(inv0))).mean())
        self._log(f"val whole_recall {recall:.5f}")
        return recall


class TrainerPartII(BaseTrainer):
    """Best = min mean quaternion angular error (trainer.py:250-253).
    PartI is frozen upstream: batches already contain PartI outputs."""

    part = "PartII"

    def __init__(self, cfg, model, model_dir, example_batch):
        super().__init__(cfg, model, model_dir)
        self.example = example_batch

    def _init_state(self, optimizer):
        e = self.example
        variables = self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed),
            e["before_eqv0"],
            e["before_eqv1"],
            e["after_eqv0"],
            e["after_eqv1"],
            e["true_idx"],
            False,
        )
        return init_train_state(variables, optimizer)

    def _make_step(self, optimizer):
        model, cfg = self.model, self.cfg.train
        return lambda s, b: part2_train_step(model, optimizer, cfg, s, b)

    def _init_best(self):
        return 100.0

    def _is_better(self, a, b):
        return a <= b

    def _validate(self, state, val_batches) -> float:
        model = self.model
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def fwd(b):
            return model.apply(
                variables,
                b["before_eqv0"],
                b["before_eqv1"],
                b["after_eqv0"],
                b["after_eqv1"],
                b["true_idx"],
                False,
            )

        errs = []
        for batch in val_batches():
            q = fwd(batch)
            errs.append(
                np.asarray(quaternion_angular_error_deg(q, batch["delta_q"]))
            )
        err = float(np.concatenate(errs).mean())
        self._log(f"val R_error {err:.4f} deg")
        return err
