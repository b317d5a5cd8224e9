"""Example filter registry — mirror of the reference's declarative
query registry (examples/filterlist.py:15-36): a name -> FilterSpec
dict built at import time so config errors surface before any event
flows (the reference's eager re.compile, examples/filterlist.py:31-32,
is FilterSpec.__post_init__'s pattern validation here)."""

from __future__ import annotations

import re

from .filters import FilterSpec

filterlist: dict[str, FilterSpec] = {
    # The reference's example filter (examples/filterlist.py:18-35):
    # non-bot edits/creates to user namespace on en.wikipedia by
    # low-edit-count users, scanned for userbox-ish regexes.
    "userboxes": FilterSpec(
        name="userboxes",
        streamfilter={"type": ("edit", "create"), "bot": False, "namespace": 2},
        streams=("recentchange", "revision-create"),
        sites=("en.wikipedia.org",),
        max_edits=100,
        regexes=(re.compile(r"userbox", re.I), r"\{\{[Uu]ser "),
        log_level=2,
    ),
    "any-edit": FilterSpec(
        name="any-edit",
        streamfilter={"type": ("edit",)},
        log_level=0,
        skip_repeats=False,
        regexes=(),
    ),
}
