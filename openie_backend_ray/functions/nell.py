"""NELL <-> Freebase type mapping (SURVEY.md S8/A6).

Port of ``models/.../NellItem.scala:10-38``: the resource file
``nelltypes-to-fbtypes.txt`` (3 tab-separated cols: nell id, freebase
type string ``/domain/typ``, display name) loads once into an
fb-type -> NellType dict. Freebase type strings normalize the same way
as ``FreeBaseType.parse`` (``models/.../FreeBaseItem.scala:17-38``):
lowercase, must have >= 2 slash-separated parts; extra parts beyond
domain/typ are dropped.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

# vendored copy of the reference's public resource — the package works
# without a reference checkout
_RESOURCE = os.path.join(
    os.path.dirname(__file__), "data", "nelltypes-to-fbtypes.txt"
)


@dataclass(frozen=True)
class NellType:
    id: str
    name: str


def parse_fb_type(s: str) -> str | None:
    """'/domain/typ[/...]' -> 'domain/typ' (lowercased) or None."""
    parts = [p for p in s.lower().split("/") if p]
    if len(parts) < 2:
        return None
    return f"{parts[0]}/{parts[1]}"


@functools.lru_cache(maxsize=1)
def fb_to_nell(path: str = _RESOURCE) -> dict[str, NellType]:
    out: dict[str, NellType] = {}
    if not os.path.exists(path):
        # an explicitly-given path must exist; only the bundled default
        # may be absent (e.g. a stripped install), and loudly
        if path != _RESOURCE:
            raise FileNotFoundError(path)
        import warnings

        warnings.warn(f"NELL resource missing: {path}; typing is a no-op")
        return out
    with open(path, encoding="utf-8") as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3:
                continue
            fb = parse_fb_type(cols[1])
            if fb is None:
                continue
            out[fb] = NellType(cols[0], cols[2])
    return out


def nell_type_for(fb_type_string: str) -> NellType | None:
    """'/book/magazine' (any case, extra parts ok) -> NellType."""
    fb = parse_fb_type(fb_type_string)
    if fb is None:
        return None
    return fb_to_nell().get(fb)
