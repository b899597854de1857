"""Parsed-store snapshot cache — skip YAML parsing when nothing changed.

Every CLI verb parses the whole record DB (reference
/root/reference/memo_cli.py:66-75 does the same with pure-Python
PyYAML). YAML parsing is the host-side floor at corpus scale: ~45 s at
100k records with SafeLoader, ~5 s with libyaml. This cache stores the
parsed (bodies, metas) next to the YAML as `<db>.yaml.snap`, keyed by a
hash of the YAML text: on load, a hash hit deserializes JSON (~20x
faster than the C YAML parse) and a miss falls back to parsing (and
refreshes the snapshot). The YAML file remains the single source of
truth — the snapshot is derived, self-invalidating, and safe to delete.

Fidelity: YAML-safe-load types that JSON cannot round-trip natively
(dates, datetimes with offsets, bytes, non-string mapping keys, tuple
keys) are wrapped in explicit tags; plain dicts/lists are wrapped too,
so tag objects can never collide with user data. Any value outside the
covered set (e.g. YAML !!set) raises Unsnapshotable and the store is
simply not cached — correctness never depends on the snapshot.

Security: the snapshot is pure JSON — no pickle, no code execution on
load, same trust level as the TPUVDB01 index container.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import json
from pathlib import Path
from typing import Any

SNAP_MAGIC = "TPUVSNAP1"

# Below this YAML size the C parse is ~10 ms and snapshot churn isn't
# worth the extra file; above it the snapshot wins ~20x on every verb.
SNAP_THRESHOLD_BYTES = 65_536


class Unsnapshotable(Exception):
    """A parsed value has no tagged-JSON encoding; skip caching."""


def snap_path(yaml_path: Path) -> Path:
    return yaml_path.with_name(yaml_path.name + ".snap")


def text_hash(text: str) -> str:
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()


# -- tagged codec ---------------------------------------------------------

def _enc(v: Any) -> Any:
    # bool/str/int/float/None round-trip natively (json allows NaN/Inf);
    # bool first structurally via the shared scalar branch is fine since
    # JSON booleans reload as bool.
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, list):
        return {"l": [_enc(x) for x in v]}
    if isinstance(v, dict):
        return {"d": [[_enc(k), _enc(x)] for k, x in v.items()]}
    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        return {"T": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"D": v.isoformat()}
    if isinstance(v, bytes):
        return {"B": base64.b64encode(v).decode("ascii")}
    if isinstance(v, tuple):  # YAML complex keys load as tuples
        return {"t": [_enc(x) for x in v]}
    raise Unsnapshotable(type(v).__name__)


def _dec(v: Any) -> Any:
    if not isinstance(v, dict):
        return v
    (tag, payload), = v.items()
    if tag == "l":
        return [_dec(x) for x in payload]
    if tag == "d":
        return {_dec(k): _dec(x) for k, x in payload}
    if tag == "T":
        return datetime.datetime.fromisoformat(payload)
    if tag == "D":
        return datetime.date.fromisoformat(payload)
    if tag == "B":
        return base64.b64decode(payload)
    if tag == "t":
        return tuple(_dec(x) for x in payload)
    raise ValueError(f"unknown snapshot tag {tag!r}")


def _json_plain(v: Any) -> bool:
    """True if v round-trips through JSON verbatim (no tags needed):
    scalars, lists, and dicts with string keys, recursively. Anything
    else (dates, bytes, int/tuple keys, ...) needs the tagged codec."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return True
    if isinstance(v, list):
        return all(_json_plain(x) for x in v)
    if isinstance(v, dict):
        return all(type(k) is str and _json_plain(x) for k, x in v.items())
    return False


# -- snapshot IO ----------------------------------------------------------

def write_snapshot(path: Path, text: str, bodies: list, metas: list) -> None:
    """Best-effort snapshot write; raises Unsnapshotable on exotic types
    (callers treat that — and any OSError — as 'just don't cache').

    When every metadata value is JSON-native the snapshot is stored
    untagged with "plain": true — load then skips the tagged decode
    entirely (measured 0.80 s -> 0.11 s at 100k records)."""
    plain = all(m is None or _json_plain(m) for m in metas)
    payload = json.dumps(
        {
            "magic": SNAP_MAGIC,
            "hash": text_hash(text),
            "plain": plain,
            "bodies": list(bodies),
            "metas": list(metas)
            if plain
            else [None if m is None else _enc(m) for m in metas],
        },
        ensure_ascii=False,
    )
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(payload, encoding="utf-8")
    tmp.replace(path)


def read_snapshot(path: Path, text: str) -> tuple[list, list] | None:
    """Return (bodies, metas) if the snapshot matches text, else None.
    Never raises: a corrupt/stale/missing snapshot is a cache miss."""
    try:
        payload = json.loads(path.read_text(encoding="utf-8"))
        if payload.get("magic") != SNAP_MAGIC:
            return None
        if payload.get("hash") != text_hash(text):
            return None
        bodies = payload["bodies"]
        if payload.get("plain"):
            metas = payload["metas"]
        else:
            metas = [None if m is None else _dec(m) for m in payload["metas"]]
        # Shape guard against a hand-damaged sidecar: bodies must be
        # strings and metas mappings (or None), same as the YAML loader
        # guarantees — anything else is a cache miss, not a crash later.
        if (
            not isinstance(bodies, list)
            or not isinstance(metas, list)
            or len(bodies) != len(metas)
            or not all(type(b) is str for b in bodies)
            or not all(m is None or isinstance(m, dict) for m in metas)
        ):
            return None
        return bodies, metas
    except Exception:
        return None
