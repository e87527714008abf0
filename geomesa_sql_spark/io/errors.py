"""Uniform error discipline for the codec surface.

Every public decode entry point must reject truncated or corrupt
streams with ValueError (or NotImplementedError for honestly
unsupported forms) — never a raw IndexError/KeyError/struct.error/
OverflowError from some interior offset arithmetic. The ops-layer
per-row guards are ``except Exception`` so a raw escape still becomes
a null row, but it surfaces in task logs as a bare KeyError from deep
inside a parser — indistinguishable from an engine bug — instead of a
one-line "truncated or corrupt stream" diagnosis, and any NEW call
site that guards more narrowly inherits the crash. The randomized
mutation law in tests/test_codec_laws.py pins this contract for every
codec; this decorator is the single place the conversion happens so a
new decoder can't forget it.
"""

from __future__ import annotations

import functools
import struct


def clean_decode(fn):
    """Convert low-level parse escapes into ValueError, preserving the
    original exception as the cause (and letting ValueError /
    NotImplementedError / zlib.error through untouched)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (IndexError, KeyError, struct.error, OverflowError) as ex:
            raise ValueError(
                f"truncated or corrupt stream: {type(ex).__name__}: {ex}"
            ) from ex

    return wrapped
