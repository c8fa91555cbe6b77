"""Pinned single-process OSM-XML parser — the extraction oracle.

This module defines the *byte-identical extraction* invariant from
BASELINE.json input_hint: for every page url, the engine's distributed
Arrow-UDF extraction (insights_spark.extract) must produce exactly the
records and canonical text this parser produces.

Semantics are lifted from the reference (NOT its code):
- changeset traversal: reference changesetmd.py:105-141 — iterate
  ``<changeset>`` elements; ``<tag k= v=>`` children become a dict;
  ``<discussion>/<comment>/<text>`` become comment rows where, within one
  ``<comment>``, the LAST ``<text>`` child wins (changesetmd.py:125-127);
  missing attributes are None (``.get(k, None)``).
- element traversal: reference osmh.py:410-535 — ``<node>/<way>/<relation>``
  with ``<tag>``, ``<nd ref>``, ``<member type ref role>`` children.
- derived-action rules: reference osmh.py:448-461 — version=='1' → create
  else modify; node with missing lat → delete; way with no nds and no tags
  → delete; relation with no members and no tags → delete. In ``.osc``
  diff files the explicit ``<create|modify|delete>`` wrapper tag wins
  (osmh.py:324-380).

The reference used lxml; lxml is unavailable in this environment, so the
pinned oracle is stdlib ``xml.etree.ElementTree`` (C accelerator). The
attribute-defaulting and traversal-order semantics above are preserved.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime
from io import BytesIO


def _ts(value: str | None) -> datetime | None:
    """Parse OSM timestamp '2021-08-05T00:00:00Z' → naive UTC datetime."""
    if value is None:
        return None
    return datetime.fromisoformat(value.rstrip("Z"))


def _num(value: str | None) -> float | None:
    return None if value is None else float(value)


def _int(value: str | None) -> int | None:
    return None if value is None else int(value)


def parse_changeset_page(payload: bytes):
    """Parse a changeset-dump payload.

    Returns (changesets, comments):
      changeset = dict(id, user_id, created_at, min_lat, max_lat, min_lon,
                       max_lon, closed_at, open, num_changes, user_name, tags)
      comment   = dict(comment_changeset_id, comment_user_id,
                       comment_user_name, comment_date, comment_text)
    """
    changesets: list[dict] = []
    comments: list[dict] = []
    # iterparse end-events with elem.clear() memory discipline, mirroring the
    # reference's streaming loop (changesetmd.py:109,156-158).
    for _event, elem in ET.iterparse(BytesIO(payload), events=("end",)):
        if elem.tag != "changeset":
            continue
        a = elem.attrib
        tags: dict[str, str] = {}
        for tag in elem.iter("tag"):
            tags[tag.attrib["k"]] = tag.attrib["v"]
        cs_id = _int(a.get("id"))
        for disc in elem.iter("discussion"):
            for comment in disc.iter("comment"):
                text = None
                for t in comment.iter("text"):
                    text = t.text  # last <text> wins (changesetmd.py:125-127)
                comments.append(
                    {
                        "comment_changeset_id": cs_id,
                        "comment_user_id": _int(comment.attrib.get("uid")),
                        "comment_user_name": comment.attrib.get("user"),
                        "comment_date": _ts(comment.attrib.get("date")),
                        "comment_text": text,
                    }
                )
        changesets.append(
            {
                "id": cs_id,
                "user_id": _int(a.get("uid")),
                "created_at": _ts(a.get("created_at")),
                "min_lat": _num(a.get("min_lat")),
                "max_lat": _num(a.get("max_lat")),
                "min_lon": _num(a.get("min_lon")),
                "max_lon": _num(a.get("max_lon")),
                "closed_at": _ts(a.get("closed_at")),
                "open": None if a.get("open") is None else a.get("open") == "true",
                "num_changes": _int(a.get("num_changes")),
                "user_name": a.get("user"),
                "tags": tags,
            }
        )
        elem.clear()
    return changesets, comments


def _derive_action(kind: str, a: dict, tags: dict, nds: list, members: list) -> str:
    """reference osmh.py:448-461."""
    if kind == "node" and a.get("lat") is None:
        return "delete"
    if kind == "way" and not nds and not tags:
        return "delete"
    if kind == "relation" and not members and not tags:
        return "delete"
    return "create" if a.get("version") == "1" else "modify"


def _element_row(kind: str, elem, wrapper_action: str | None) -> dict:
    # hot path (~15-25 elements per page at web scale): conversions inlined
    # rather than routed through the _int/_num/_ts helpers — semantics are
    # identical (``.get(k, None)`` defaulting per changesetmd.py:134-141)
    a = elem.attrib
    tags: dict[str, str] = {}
    nds: list[int] = []
    members: list[tuple] = []
    for child in elem:
        t = child.tag
        ca = child.attrib
        if t == "tag":
            tags[ca["k"]] = ca["v"]
        elif t == "nd":
            nds.append(int(ca["ref"]))
        elif t == "member":
            r = ca.get("ref")
            members.append(
                (int(r) if r is not None else None, ca.get("type"), ca.get("role"))
            )
    version = a.get("version")
    if wrapper_action:
        action = wrapper_action
    else:
        action = _derive_action(kind, a, tags, nds, members)
    v = a.get("id")
    lat = a.get("lat")
    lon = a.get("lon")
    cs = a.get("changeset")
    ts = a.get("timestamp")
    uid = a.get("uid")
    return {
        "id": int(v) if v is not None else None,
        "type": kind,
        "tags": tags,
        "lat": float(lat) if lat is not None else None,
        "lon": float(lon) if lon is not None else None,
        "nds": nds,
        "members": members,
        "changeset": int(cs) if cs is not None else None,
        "timestamp": datetime.fromisoformat(ts.rstrip("Z")) if ts is not None else None,
        "uid": int(uid) if uid is not None else None,
        "version": int(version) if version is not None else None,
        "action": action,
        "country": None,
    }


_ELEMENT_KINDS = ("node", "way", "relation")
_WRAPPER_KINDS = ("create", "modify", "delete")

# Above this size, parse with iterparse + elem.clear() streaming discipline
# (mega-payload safety); below it, one fromstring tree walk — same rows in the
# same document order, without the per-event generator machinery that
# dominates small-payload parse time.
_STREAM_PARSE_BYTES = 8 * 1024 * 1024


def _walk_elements(root, rows: list[dict]) -> None:
    """Pre-order walk emitting element rows in document order.

    Iterative (explicit stack), not recursive: a deeply-nested payload
    would otherwise raise RecursionError, which escapes the ET.ParseError
    skip-bad-page posture and kills the task. Root-tag parity with the
    iterparse path: a payload whose ROOT is itself a node/way/relation
    emits that one row, and a root-level create/modify/delete wrapper
    stamps its action on the children.
    """
    if root.tag in _ELEMENT_KINDS:
        rows.append(_element_row(root.tag, root, None))
        return
    root_wrapper = root.tag if root.tag in _WRAPPER_KINDS else None
    stack = [(child, root_wrapper) for child in reversed(list(root))]
    while stack:
        elem, wrapper = stack.pop()
        tag = elem.tag
        if tag in _ELEMENT_KINDS:
            rows.append(_element_row(tag, elem, wrapper))
        elif tag in _WRAPPER_KINDS:
            stack.extend((c, tag) for c in reversed(list(elem)))
        else:
            # unknown container: keep scanning (iterparse parity — it yields
            # element end-events at any nesting depth)
            stack.extend((c, wrapper) for c in reversed(list(elem)))


def parse_element_page(payload: bytes) -> list[dict]:
    """Parse an element-history or .osc-diff payload into element rows.

    In ``<osmChange>`` documents the ``<create|modify|delete>`` wrapper stamps
    the action (osmh.py:324-380); in plain history dumps the action is derived
    (osmh.py:448-461).
    """
    rows: list[dict] = []
    if len(payload) <= _STREAM_PARSE_BYTES:
        _walk_elements(ET.fromstring(payload), rows)
        return rows
    stack: list[str] = []
    for event, elem in ET.iterparse(BytesIO(payload), events=("start", "end")):
        if event == "start":
            if elem.tag in _WRAPPER_KINDS:
                stack.append(elem.tag)
            continue
        if elem.tag in _WRAPPER_KINDS:
            stack.pop()
            elem.clear()
        elif elem.tag in _ELEMENT_KINDS:
            rows.append(_element_row(elem.tag, elem, stack[-1] if stack else None))
            elem.clear()
    return rows


# ---------------------------------------------------------------------------
# Canonical text — the byte-identical per-url invariant.
# ---------------------------------------------------------------------------

def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def _fmt_tags(tags: dict) -> str:
    return ";".join(f"{k}={tags[k]}" for k in sorted(tags))


def canonical_text_changesets(changesets: list[dict], comments: list[dict]) -> str:
    lines = []
    for c in changesets:
        lines.append(
            "changeset|" + "|".join(
                _fmt(c[k])
                for k in (
                    "id", "user_id", "created_at", "min_lat", "min_lon",
                    "max_lat", "max_lon", "closed_at", "open",
                    "num_changes", "user_name",
                )
            ) + "|" + _fmt_tags(c["tags"])
        )
    for m in comments:
        lines.append(
            "comment|" + "|".join(
                _fmt(m[k])
                for k in (
                    "comment_changeset_id", "comment_user_id",
                    "comment_user_name", "comment_date", "comment_text",
                )
            )
        )
    return "\n".join(lines)


def canonical_text_elements(rows: list[dict]) -> str:
    lines = []
    for r in rows:
        nds = ",".join(str(n) for n in r["nds"])
        members = ",".join(
            f"{_fmt(m[0])}:{_fmt(m[1])}:{_fmt(m[2])}" for m in r["members"]
        )
        lines.append(
            "element|" + "|".join(
                _fmt(r[k])
                for k in (
                    "type", "id", "version", "changeset", "timestamp",
                    "uid", "lat", "lon", "action",
                )
            ) + f"|nds={nds}|members={members}|" + _fmt_tags(r["tags"])
        )
    return "\n".join(lines)


def extract_page(url: str, payload: bytes) -> dict:
    """Full single-page extraction: records + canonical text.

    The page kind is carried in the url path segment
    (``.../changeset-dump/...``, ``.../element-history/...``,
    ``.../osc-diff/...``) — mirroring how the reference dispatches by file
    type (changeset dump vs .osc vs history dump).
    """
    if "/changeset-dump/" in url:
        changesets, comments = parse_changeset_page(payload)
        return {
            "kind": "changeset-dump",
            "changesets": changesets,
            "comments": comments,
            "elements": [],
            "text": canonical_text_changesets(changesets, comments),
        }
    rows = parse_element_page(payload)
    kind = "osc-diff" if "/osc-diff/" in url else "element-history"
    return {
        "kind": kind,
        "changesets": [],
        "comments": [],
        "elements": rows,
        "text": canonical_text_elements(rows),
    }
