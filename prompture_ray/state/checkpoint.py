"""Per-partition lineage + metrics checkpoint manifest.

Descendant of the reference's run_id-keyed checkpoint snapshots
(reference: prompture/checkpoints/types.py:27-108 — ``to_dict``/``from_dict``
at :73-108; stores at prompture/checkpoints/stores.py:63-299) crossed with
its append-only usage events (prompture/infra/tracker.py:49-81), re-shaped
for a distributed batch run:

- one JSON record per completed input partition under
  ``<out_dir>/manifest/<pid>.json``
- record shape (FIXTURES.md §4): ``{run_id, partition_id, status,
  input_fragments, rows, ok_rows, violations, violations_by_check,
  elapsed_ms, ts}``
- resume = list manifest → anti-join pending input fragments → rerun only
  those; partition outputs are keyed by pid so reruns are idempotent
  (incomplete pids are wiped before rerun).

Metrics come from manifest records, never re-derived from partial outputs,
so a resumed run cannot double-count (SURVEY §7.4).
"""

from __future__ import annotations

import datetime as _dt
import json
import shutil
from pathlib import Path

STATUS_RUNNING = "running"
STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"


class Manifest:
    def __init__(self, out_dir: str | Path, run_id: str):
        self.out_dir = Path(out_dir)
        self.dir = self.out_dir / "manifest"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.run_id = run_id

    # -- record io -------------------------------------------------------
    def _path(self, pid: int) -> Path:
        return self.dir / f"{pid:05d}.json"

    def write(self, pid: int, record: dict) -> None:
        record = {"run_id": self.run_id, "partition_id": pid, **record}
        record.setdefault("status", STATUS_COMPLETED)
        record.setdefault("ts", _dt.datetime.now(_dt.timezone.utc)
                          .strftime("%Y-%m-%dT%H:%M:%SZ"))
        tmp = self._path(pid).with_suffix(".tmp")
        tmp.write_text(json.dumps(record, sort_keys=True))
        tmp.rename(self._path(pid))  # atomic publish

    def read(self, pid: int) -> dict | None:
        p = self._path(pid)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def records(self) -> list[dict]:
        out = []
        for p in sorted(self.dir.glob("*.json")):
            out.append(json.loads(p.read_text()))
        return out

    # -- resume logic ----------------------------------------------------
    def completed_pids(self) -> set[int]:
        return {r["partition_id"] for r in self.records()
                if r.get("status") == STATUS_COMPLETED}

    def pending(self, fragments: list[str]) -> list[tuple[int, str]]:
        """Partition ids are assigned by sorted fragment order — stable
        across runs as long as the input file set is stable."""
        done = self.completed_pids()
        return [(pid, f) for pid, f in enumerate(sorted(fragments))
                if pid not in done]

    def clean_incomplete(self, violations_dir: str | Path) -> list[int]:
        """Remove violation output dirs of partitions without a completed
        manifest record (idempotent rerun guarantee)."""
        vd = Path(violations_dir)
        done = self.completed_pids()
        removed = []
        if vd.exists():
            for sub in vd.glob("pid=*"):
                pid = int(sub.name.split("=")[1])
                if pid not in done:
                    shutil.rmtree(sub)
                    removed.append(pid)
        return removed

    def totals(self) -> dict:
        """Merged metrics across completed partitions (the authoritative
        source for the run report)."""
        rows = ok = viol = 0
        by_check: dict[str, int] = {}
        elapsed = 0.0
        for r in self.records():
            if r.get("status") != STATUS_COMPLETED:
                continue
            rows += r.get("rows", 0)
            ok += r.get("ok_rows", 0)
            viol += r.get("violations", 0)
            elapsed += r.get("elapsed_ms", 0.0)
            for k, v in (r.get("violations_by_check") or {}).items():
                by_check[k] = by_check.get(k, 0) + v
        return {"rows": rows, "ok_rows": ok, "violations": viol,
                "violations_by_check": by_check,
                "partitions": len(self.completed_pids()),
                "elapsed_ms_sum": elapsed}


# ---------------------------------------------------------------------------
# budget guard (reference check_budget / BudgetExceededError,
# prompture/infra/tracker.py:604-698 — token/cost ceilings become
# row/violation/wall-time ceilings in the data-plane engine)
# ---------------------------------------------------------------------------

class BudgetExceededError(RuntimeError):
    """Raised when a run crosses a configured budget ceiling."""

    def __init__(self, kind: str, value, limit):
        self.kind = kind
        self.value = value
        self.limit = limit
        super().__init__(f"budget exceeded: {kind}={value} > limit={limit}")


def check_budget(totals: dict, *, max_rows: int | None = None,
                 max_violations: int | None = None,
                 max_violation_rate: float | None = None,
                 max_elapsed_ms: float | None = None) -> None:
    """Raise BudgetExceededError when the running totals cross a ceiling.

    Call with a manifest ``totals()`` dict (or the fold's running
    counters) after each completed partition — the distributed analog of
    the reference's per-call budget check. All limits optional.
    """
    rows = totals.get("rows", 0)
    viol = totals.get("violations", 0)
    if max_rows is not None and rows > max_rows:
        raise BudgetExceededError("rows", rows, max_rows)
    if max_violations is not None and viol > max_violations:
        raise BudgetExceededError("violations", viol, max_violations)
    if max_violation_rate is not None and rows:
        rate = viol / rows
        if rate > max_violation_rate:
            raise BudgetExceededError("violation_rate", round(rate, 6),
                                      max_violation_rate)
    if max_elapsed_ms is not None and \
            totals.get("elapsed_ms_sum", 0.0) > max_elapsed_ms:
        raise BudgetExceededError("elapsed_ms", totals["elapsed_ms_sum"],
                                  max_elapsed_ms)
