"""Crosswikis "lnrm" anchor normalization (SURVEY.md M15).

Port of ``linker/.../util/CrosswikisHandler.java:23-29`` (public
Crosswikis convention): NFD-normalize, strip combining diacritics,
lowercase, drop every non-alphanumeric character."""

from __future__ import annotations

import unicodedata


def lnrm(s: str) -> str:
    nfd = unicodedata.normalize("NFD", s)
    no_marks = "".join(c for c in nfd if not unicodedata.combining(c))
    return "".join(c for c in no_marks.lower() if c.isalnum())
