"""Best-accuracy checkpointing with the reference's 3-tier warm start.

Reproduces train.py semantics:
  * save: ``<ROOT>/logs/checkpoints/<model-name>/acc%.3f_e%d.ckpt`` written only when
    test accuracy improves (train.py:185-196); model variables only — the reference
    never persists optimizer state.
  * load (train.py:198-214): tier 1 — latest own checkpoint (sorted glob, so the
    highest-accuracy file wins); tier 2 — the slowfast-HTAH checkpoint, transferring
    the whole-body stream into a part stream; tier 3 — a converted Kinetics
    ``SLOWFAST_8x8_R50`` warm start with the 12 mismatched keys deleted
    (train.py:93-123), if a torch state_dict file is supplied.

Serialization is flax msgpack of ``{'params':..., 'batch_stats':...}``.
"""

from __future__ import annotations

import glob
import pickle
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from flax import serialization

from ..models.torch_convert import delete_mismatch, torch_to_flax


def ckpt_dir(cfg) -> Path:
    return Path(cfg.CHALEARN.ROOT, cfg.MODEL.LOGS, cfg.MODEL.CKPT_DIR, cfg.MODEL.NAME)


def save_checkpoint(cfg, variables: Dict, epoch: int, acc: float,
                    backend: str = "msgpack") -> Optional[Path]:
    """Write acc%.3f_e%d.ckpt (skipped in DEBUG, train.py:191-195).

    backend 'msgpack' (default): single-file flax bytes — byte-for-byte what the
    reference's state_dict-per-file scheme becomes here. backend 'orbax': an
    orbax.checkpoint directory of the same name — the multi-host/async production
    path (sharded arrays save in parallel per host).
    """
    if cfg.DEBUG:
        return None
    d = ckpt_dir(cfg)
    d.mkdir(parents=True, exist_ok=True)
    path = d / ("acc%.3f_e%d.ckpt" % (acc, epoch))
    payload = {k: variables[k] for k in ("params", "batch_stats") if k in variables}
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path.absolute(), payload)
        return path
    path.write_bytes(serialization.to_bytes(payload))
    return path


def _latest(pattern: str) -> Optional[Path]:
    files = sorted(glob.glob(pattern))
    return Path(files[-1]) if files else None


def load_checkpoint_bytes(path: Path, template: Dict) -> Dict:
    tmpl = {k: template[k] for k in ("params", "batch_stats") if k in template}
    if path.is_dir():  # orbax directory checkpoint
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path.absolute(), tmpl)
    else:
        restored = serialization.from_bytes(tmpl, path.read_bytes())
    out = dict(template)
    out.update(restored)
    return out


def load_checkpoint(cfg, template: Dict, torch_warmstart: Optional[Path] = None) -> Dict:
    """3-tier restore; returns (possibly updated) variables."""
    own = _latest(str(ckpt_dir(cfg) / "*.ckpt"))
    if own is not None:
        print(f"loading checkpoint from {own}")
        return load_checkpoint_bytes(own, template)

    htah = _latest(str(ckpt_dir(cfg).parent / "slowfast-HTAH" / "*.ckpt"))
    if htah is not None and "slowfast" in cfg.MODEL.NAME:
        print(f"warning: no checkpoint found, using HTAH checkpoint {htah}")
        return load_checkpoint_bytes(htah, template)

    if torch_warmstart is not None and Path(torch_warmstart).exists():
        print(f"warm-starting from torch checkpoint {torch_warmstart}")
        return load_torch_warmstart(Path(torch_warmstart), template)

    print("warning: no checkpoint found")
    return template


def load_torch_warmstart(path: Path, template: Dict) -> Dict:
    """Kinetics warm start: pickle of {'model_state': state_dict} or a raw
    state_dict pickle; mismatched keys deleted per train.py:93-111, remaining keys
    merged over the template (strict=False semantics)."""
    with path.open("rb") as f:
        obj = pickle.load(f)
    state_dict = obj.get("model_state", obj) if isinstance(obj, dict) else obj
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    delete_mismatch(state_dict)
    converted = torch_to_flax(state_dict, arch="slowfast")
    out = {k: _merge(template.get(k, {}), converted.get(k, {})) for k in template}
    return out


def _merge(base, update):
    if not isinstance(base, dict):
        return update if update is not None else base
    out = dict(base)
    for k, v in (update or {}).items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out
