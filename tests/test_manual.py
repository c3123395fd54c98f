"""docs/MANUAL.md cannot rot: the section-3.1 key reference is checked
against the RetrievalConfig dataclass field-for-field (every accepted
[MCMC] key documented; no phantom keys; stated defaults match the
code's defaults where the table states a literal).
"""

import dataclasses
import os
import re

import numpy as np

from bart_tpu.driver.config import RetrievalConfig

MANUAL = os.path.join(os.path.dirname(__file__), "..", "docs", "MANUAL.md")


def _manual_section3():
    text = open(MANUAL).read()
    start = text.index("### 3.1 Complete key reference")
    end = text.index("### 3.2")
    return text[start:end]


def _documented_keys(sec):
    """Keys from `| `key` | default | meaning |` table rows plus the
    inert-compatibility list; slash-joined cells document several."""
    keys = {}
    for m in re.finditer(r"^\| ([^|]+) \| ([^|]*) \|", sec, re.M):
        cell, default = m.group(1).strip(), m.group(2).strip()
        names = re.findall(r"`([A-Za-z_][A-Za-z0-9_]*)`", cell)
        for n in names:
            keys[n] = default if len(names) == 1 else None
    # the accepted-but-inert paragraph
    inert = re.search(r"compatibility flags[^:]*:(.*?)\n\n", sec, re.S)
    if inert:
        for n in re.findall(r"`([A-Za-z_/]+)`", inert.group(1)):
            for part in n.split("/"):
                keys[part] = None
    return keys


def test_manual_documents_every_config_key():
    sec = _manual_section3()
    documented = _documented_keys(sec)
    fields = {f.name for f in dataclasses.fields(RetrievalConfig)}

    missing = sorted(fields - set(documented))
    assert not missing, (
        f"config keys absent from MANUAL.md section 3.1: {missing}")

    phantom = sorted(set(documented) - fields)
    assert not phantom, (
        f"MANUAL.md documents keys that RetrievalConfig does not "
        f"accept: {phantom}")


def test_manual_defaults_match_code():
    sec = _manual_section3()
    documented = _documented_keys(sec)
    cfg = RetrievalConfig()
    mismatches = []
    for name, stated in documented.items():
        if stated in (None, "", "—"):
            continue
        stated_plain = stated.strip("`")
        actual = getattr(cfg, name)
        if isinstance(actual, bool):
            ok = stated_plain == str(actual)
        elif isinstance(actual, (int, float)):
            try:
                ok = np.isclose(float(stated_plain), float(actual))
            except ValueError:
                continue  # prose cell ("Asplund 2009 file") — not a literal
        elif isinstance(actual, str):
            if " " in stated_plain:
                continue  # prose cell ("Asplund 2009 file"), not a literal
            ok = stated_plain == actual
        else:
            continue
        if not ok:
            mismatches.append((name, stated_plain, actual))
    assert not mismatches, (
        f"MANUAL.md defaults disagree with RetrievalConfig: {mismatches}")
