"""Checkpointing via orbax.

The reference saves per-epoch ``state_dict`` files and never resumes
(SURVEY.md §5: vaegan_code.py:193, main_vae.py:204-205, nf_code.py:623-625
save model+optimizer; loading happens only in eval scripts). Here checkpoints
carry the FULL training state — params, BatchNorm stats, optimizer moments,
step counter and RNG key — so training is resumable, with retention of the
last N checkpoints and async-friendly orbax storage.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Save/restore a pytree train state under ``<dir>/<step>``."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                               create=True)
        # Register the standard handler up front: a manager that has never
        # save()d (fresh process — every eval entry point) otherwise has no
        # handler for the default item, item_metadata() returns None, and
        # the PRNG-family detection below is blind (observed live: the TSTR
        # `synt` leg of the round-4 soak died on the keyless fallback).
        try:
            self.manager = ocp.CheckpointManager(
                self.directory, options=options,
                item_handlers=ocp.StandardCheckpointHandler())
        except TypeError:   # older orbax without item_handlers
            self.manager = ocp.CheckpointManager(self.directory,
                                                 options=options)

    def save(self, step: int, state: Any, key: Optional[jax.Array] = None,
             wait: bool = False):
        payload = {"state": state}
        if key is not None:
            payload["rng_key"] = jax.random.key_data(key)
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def _key_impl_from_metadata(self, step: int) -> Optional[str]:
        """Read the saved rng_key's shape from checkpoint METADATA and map it
        to the PRNG family ((2,) threefry / (4,) rbg) — deterministic, no
        template-mismatch exception dance. Returns "absent" ONLY when real
        metadata shows no rng_key; None (unknown) when metadata is
        unavailable — a fresh manager with no registered handler returns
        None from item_metadata(), and treating that as "absent" sent the
        keyless restore against a keyed checkpoint (structure-mismatch
        ValueError, observed live on the TSTR soak leg)."""
        try:
            meta = self.manager.item_metadata(step)
            if hasattr(meta, "tree"):       # newer orbax wraps the pytree
                meta = meta.tree
            if not isinstance(meta, dict):
                return None                 # metadata unavailable, not absent
            if "rng_key" not in meta:
                return "absent"
            shape = tuple(getattr(meta["rng_key"], "shape", ()) or ())
            return {(4,): "rbg", (2,): "threefry2x32"}.get(shape)
        except Exception:
            return None

    def restore(self, state_template: Any, step: Optional[int] = None,
                key_impl: Optional[str] = None
                ) -> Tuple[Any, Optional[jax.Array], int]:
        """Restore (state, rng_key, step). ``state_template`` is a state with
        the right structure (e.g. a freshly init'ed one). ``key_impl`` names
        the PRNG family of the saved key (RunConfig.prng_impl); key_data
        shape and wrapping are impl-specific (threefry (2,) vs rbg (4,)).
        When ``key_impl`` is not given (eval entry points), the family is
        detected from the checkpoint metadata — a threefry-template attempt
        against an rbg-keyed checkpoint is NOT guaranteed to raise a
        catchable ValueError (tensorstore can surface it as a bare
        Exception out of asyncio, observed on the TPU restore path)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        detected = self._key_impl_from_metadata(step)
        if detected == "absent":
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore({"state": state_template}))
            return restored["state"], None, step
        # try the metadata-detected impl first (authoritative), then the
        # requested impl, then the other family, then keyless (checkpoints
        # saved without an RNG key). Only template-mismatch errors fall
        # through to the next attempt — a genuinely corrupt checkpoint or a
        # state-shape mismatch must surface, not degrade silently to a
        # fresh RNG key (ADVICE r2).
        mismatch = (ValueError, KeyError, TypeError)
        attempts = []
        impls = []
        for cand in (detected, key_impl,
                     "rbg" if "rbg" not in (detected, key_impl) else None):
            if cand not in impls:
                impls.append(cand)
        for impl in impls:
            ref_key = (jax.random.key(0, impl=impl) if impl
                       else jax.random.key(0))
            template = {"state": state_template,
                        "rng_key": jax.random.key_data(ref_key)}
            try:
                restored = self.manager.restore(
                    step, args=ocp.args.StandardRestore(template))
                key = jax.random.wrap_key_data(restored["rng_key"],
                                               impl=impl)
                return restored["state"], key, step
            except Exception as e:   # noqa: BLE001 — see filter below
                # tensorstore's async reader can surface a template shape
                # mismatch as a bare Exception rather than ValueError;
                # re-raise anything that doesn't look like one
                if not isinstance(e, mismatch) and \
                        "not compatible" not in str(e) and \
                        "rng_key" not in str(e):
                    raise
                attempts.append(f"impl={impl}: {type(e).__name__}: {e}")
                continue
        print(f"[checkpoint] no RNG key matched at step {step}; resuming "
              f"WITHOUT the saved key (fresh key stream). Attempts: "
              + " | ".join(a.splitlines()[0][:120] for a in attempts))
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore({"state": state_template}))
        return restored["state"], None, step

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
