"""Checkpointing: Orbax for array trees + JSON sidecar for metadata.

Carries the same logical schema as the reference's torch.save dicts
(train_hybrid_maml_v5.py:311-335: model + Koppen + optimizer + scheduler
state + epoch + loss + architecture config; adapt_hybrid_v5.py:240-257 adds
region metadata + normalization stats) — and, unlike the reference, supports
true mid-run resume (optimizer state and epoch are reloaded, SURVEY.md
section 5 checkpoint/resume gap).

Layout of a checkpoint directory:
  <dir>/arrays/   Orbax pytree (params, opt_state, any array state)
  <dir>/meta.json metadata: config dict, norm stats, epoch, losses, tags
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    return x


def save_checkpoint(path: str, arrays, meta: dict | None = None) -> str:
    """Save `arrays` (any pytree of jax/numpy arrays) + JSON `meta`.

    Overwrites an existing checkpoint at `path` atomically-ish (write to a
    sibling tmp dir, then swap).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(tmp, "arrays"), jax.tree.map(np.asarray, arrays))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(_to_jsonable(meta or {}), f, indent=2)

    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


class AsyncCheckpointer:
    """Overlapped checkpoint writes (VERDICT r2 item 10).

    A save through the axon TPU tunnel costs ~1 s — mostly the device->host
    fetch of the params/opt-state tree, comparable to 1.5 meta steps. The
    training loop also DONATES its state into the next step, so a background
    thread must never touch the live buffers. `save()` therefore:

      1. snapshots the tree on device (`jnp.copy` — an HBM->HBM copy into
         fresh buffers, microseconds, safe against donation), then
      2. hands the snapshot to a single background thread that performs the
         tunnel fetch + Orbax/JSON write while the main thread dispatches
         the next steps.

    One save is in flight at a time (a new `save()` joins the previous one,
    preserving write order per path); `wait()` must be called before
    reading the checkpoint back or returning from the engine, and re-raises
    any background failure loudly.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, path: str, arrays, meta: dict | None = None) -> None:
        import threading

        import jax.numpy as jnp

        self.wait()
        # Snapshot EVERY mutable input before handing off to the thread:
        # device arrays via jnp.copy (async, rides under compute), host
        # numpy leaves via np.copy, and the meta dict itself — the caller
        # may mutate any of them (difficulty EMAs, sampler state) while the
        # background write is in flight.
        import copy as _copy

        import numpy as _np

        snapshot = jax.tree.map(
            lambda x: jnp.copy(x)
            if isinstance(x, jax.Array)
            else (_np.copy(x) if isinstance(x, _np.ndarray) else x),
            arrays,
        )
        meta = _copy.deepcopy(meta)

        def _write():
            try:
                save_checkpoint(path, snapshot, meta)
            except BaseException as e:  # surfaced by the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="wfstgcn-async-ckpt", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err


def load_checkpoint(path: str, like=None):
    """Load (arrays, meta) from `path`.

    `like` optionally provides a template pytree so arrays restore with the
    exact structure/dtypes (recommended for opt_state trees, whose tuples a
    raw restore would flatten to lists). A `like` covering only a subtree of
    what was saved (e.g. params without opt_state) restores just that
    subtree.

    The SAVED structure is authoritative: if a `like` subtree's leaf paths
    are not all present in the checkpoint (e.g. a template built with fused
    LSTM biases reading a checkpoint of torch-imported split `b_ih`/`b_hh`
    leaves), that subtree is restored raw with the checkpoint's own
    structure instead. Orbax's partial_restore would otherwise SILENTLY
    keep the template's (random-init) values for the missing leaves —
    caught as a real weight-corruption bug in benchmarks/recipe_parity.py.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    arr_path = os.path.join(path, "arrays")
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            import jax.tree_util as jtu
            from orbax.checkpoint import args as ocp_args

            def canon(kp) -> str:
                # NamedTuples (optax states) flatten with attribute keys
                # (`.count`) while orbax metadata stores them as dicts
                # (`['count']`) — compare on the bare key/index/name.
                parts = []
                for e in kp:
                    for attr in ("idx", "key", "name"):
                        v = getattr(e, attr, None)
                        if v is not None:
                            parts.append(str(v))
                            break
                    else:
                        parts.append(str(e))
                return "/".join(parts)

            md = ckptr.metadata(arr_path)
            md_tree = getattr(md, "item_metadata", md)
            saved_paths = {
                canon(kp)
                for kp, _ in jtu.tree_flatten_with_path(md_tree)[0]
            }
            like_np = jax.tree.map(np.asarray, like)

            def covered(subtree) -> bool:
                return {
                    canon(kp)
                    for kp, _ in jtu.tree_flatten_with_path(subtree)[0]
                } <= saved_paths

            if not isinstance(like_np, dict):
                templated = like_np if covered(like_np) else None
                arrays = (
                    ckptr.restore(
                        arr_path,
                        ocp_args.PyTreeRestore(
                            item=templated, partial_restore=True
                        ),
                    )
                    if templated is not None
                    else ckptr.restore(arr_path)
                )
            else:
                matched = {
                    k: v for k, v in like_np.items() if covered({k: v})
                }
                arrays = {}
                if matched:
                    arrays.update(
                        ckptr.restore(
                            arr_path,
                            ocp_args.PyTreeRestore(
                                item=matched, partial_restore=True
                            ),
                        )
                    )
                missing = [k for k in like_np if k not in matched]
                if missing:
                    raw = ckptr.restore(arr_path)
                    for k in missing:
                        arrays[k] = raw[k]
        else:
            arrays = ckptr.restore(arr_path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return arrays, meta


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "meta.json"))


def load_meta(path: str) -> dict:
    """Read only the JSON metadata of a checkpoint (cheap peek)."""
    with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
        return json.load(f)


def check_family(meta: dict, expected_family: str, path: str) -> None:
    """Fail with a clear message when a checkpoint was trained with a
    different model family than the current config expects (the Orbax
    structure-mismatch error this preempts is cryptic)."""
    saved = (meta.get("config") or {}).get("model", {}).get("family")
    if saved is not None and saved != expected_family:
        raise ValueError(
            f"checkpoint {path} holds a {saved!r}-family model but the "
            f"current config expects {expected_family!r}; pass "
            f"-o model.family={saved} (and matching architecture overrides)"
        )
