"""Pure-Python dict-replay oracle — the judge of the Spark engine.

Replays a change-event list in LSN order into a plain dict and returns the
final table state. This is the differential-testing harness the reference
itself prescribed (``/root/reference/brainstorming.md:42-53``: run old and
new on identical input and compare), with the reference implementation
replaced by an obviously-correct sequential replay.

Semantics pinned here (the engine must match bitwise):

- events apply in strictly increasing ``lsn`` order, regardless of arrival
  order (the reference's ``max(id)`` last-writer-wins,
  ``/root/reference/config/queries.py:21-44``);
- an event applies only if ``lsn > last_lsn[doc_id]`` (exactly-once /
  idempotency guard — the reference's ``is_processed`` watermark,
  ``/root/reference/src/database/operations.py:95-108``);
- ``delete`` tombstones the doc but keeps ``last_lsn`` so an out-of-order
  lower-LSN update can never resurrect it (SURVEY.md §7.4);
- invalid payloads go to quarantine and do NOT advance the doc's state.
  Reasons, checked in this order: ``null_tokens``, ``empty_tokens``,
  ``bad_n_tok`` (n_tok != len(tokens)), ``bad_source`` (not in whitelist).
- ``schema_change`` events mutate the schema-op log (applied to the lake
  table's schema in the engine) and carry no row payload.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .events import SOURCE_WHITELIST

QUARANTINE_REASONS = ("null_tokens", "empty_tokens", "bad_n_tok", "bad_source")


def validation_reason(ev: dict, whitelist=tuple(SOURCE_WHITELIST)) -> str | None:
    """Reason string if the event payload is invalid, else None.

    Deletes carry no payload and are always valid.
    """
    if ev["op"] == "delete":
        return None
    if ev["tokens"] is None:
        return "null_tokens"
    if len(ev["tokens"]) == 0:
        return "empty_tokens"
    if ev["n_tok"] is None or ev["n_tok"] != len(ev["tokens"]):
        return "bad_n_tok"
    if ev["source"] not in whitelist:
        return "bad_source"
    return None


@dataclass
class OracleState:
    # doc_id -> {"tokens":..., "n_tok":..., "source":..., "last_lsn":..., "deleted":...}
    docs: dict = field(default_factory=dict)
    quarantine: list = field(default_factory=list)
    schema_ops: list = field(default_factory=list)
    max_applied_lsn: int = 0

    def live_docs(self) -> dict:
        return {k: v for k, v in self.docs.items() if not v["deleted"]}


def replay(events: list[dict], state: OracleState | None = None) -> OracleState:
    state = state or OracleState()
    for ev in sorted(events, key=lambda e: e["lsn"]):
        if ev["lsn"] <= state.max_applied_lsn:
            continue  # replayed slice — exactly-once
        state.max_applied_lsn = max(state.max_applied_lsn, ev["lsn"])
        if ev["op"] == "schema_change":
            state.schema_ops.append((ev["lsn"], ev["schema_change"]))
            continue
        reason = validation_reason(ev)
        if reason is not None:
            state.quarantine.append({**ev, "reason": reason})
            continue
        doc = state.docs.get(ev["doc_id"])
        if doc is not None and ev["lsn"] <= doc["last_lsn"]:
            continue
        if ev["op"] == "delete":
            state.docs[ev["doc_id"]] = {
                "tokens": None,
                "n_tok": None,
                "source": None,
                "last_lsn": ev["lsn"],
                "deleted": True,
            }
        else:  # insert / update — CDC upsert semantics
            state.docs[ev["doc_id"]] = {
                "tokens": list(ev["tokens"]),
                "n_tok": ev["n_tok"],
                "source": ev["source"],
                "last_lsn": ev["lsn"],
                "deleted": False,
            }
    return state
