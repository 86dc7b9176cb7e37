"""Incremental job planner: dependency toposort + content-hash diff.

Reference semantics (SURVEY §3.2): specs form a DAG through ``ref()``
edges; each run (1) topologically orders them
(``parse/toposort.py:55-85`` — reimplemented here as Kahn's algorithm,
not copied), (2) diffs each spec's content hash against the persisted
state (``table_definition_reader.py:44-62``), (3) marks changed specs
AND their transitive dependents for full refresh, everything else for
incremental-only processing (``:51-58`` propagation), and (4) persists
the new hashes with an optimistic-lock version
(``parse_state_manager.py:64-133``).

The plan is pure metadata — executing it means calling
``compiler.compile_spec`` per entry in order, full-refresh entries
against the whole history, incremental entries against the new slice
only (M1 idempotent merge semantics either way).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from ethereum_etl_airflow_spark.plans.spec import ExtractionSpec


class CycleError(ValueError):
    pass


def toposort(specs: dict[str, ExtractionSpec]) -> list[str]:
    """Kahn's algorithm over ref() edges; deterministic (name-sorted)
    order among ready nodes; raises CycleError on cycles. Edges to
    unknown names are treated as external tables (no ordering need)."""
    indeg = {name: 0 for name in specs}
    dependents: dict[str, list[str]] = {name: [] for name in specs}
    for name, spec in specs.items():
        for ref in spec.refs:
            if ref in specs:
                indeg[name] += 1
                dependents[ref].append(name)
    ready = sorted(n for n, d in indeg.items() if d == 0)
    out: list[str] = []
    while ready:
        n = ready.pop(0)
        out.append(n)
        changed = False
        for m in dependents[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                ready.append(m)
                changed = True
        if changed:
            ready.sort()
    if len(out) != len(specs):
        cyc = sorted(set(specs) - set(out))
        raise CycleError(f"dependency cycle among: {cyc}")
    return out


def transitive_dependents(specs: dict[str, ExtractionSpec], roots: set[str]) -> set[str]:
    dependents: dict[str, set[str]] = {name: set() for name in specs}
    for name, spec in specs.items():
        for ref in spec.refs:
            if ref in dependents:
                dependents[ref].add(name)
    seen = set(roots)
    frontier = list(roots)
    while frontier:
        n = frontier.pop()
        for m in dependents.get(n, ()):
            if m not in seen:
                seen.add(m)
                frontier.append(m)
    return seen


@dataclass
class PlanEntry:
    name: str
    mode: str  # 'full_refresh' | 'incremental'
    content_hash: str


class PlannerState:
    """Per-dataset state file: spec content hashes + last logical
    position + optimistic-lock version (parse_state_manager.py:25-133)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"_version": 0, "_last_pos": None, "hashes": {}}

    #: stale-lock TTL (seconds): a dead planner's lock is broken after this
    LOCK_TTL_SEC = 300.0

    def save(self, state: dict, expected_version: int) -> None:
        """Check-and-swap of the state file, serialized under an
        exclusive O_CREAT|O_EXCL lockfile so two concurrent planners
        cannot both pass the version check and clobber each other
        (reference: parse_state_manager.py:88-116 version lock). A lock
        whose holder is dead (or older than LOCK_TTL_SEC) is broken."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        lock_path = f"{self.path}.lock"
        lock_fd = None
        for attempt in range(2):
            try:
                lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(lock_fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode())
                break
            except FileExistsError:
                if attempt == 0 and self._break_stale_lock(lock_path):
                    continue
                raise RuntimeError(
                    f"planner state lock held by another planner ({lock_path})"
                )
        try:
            cur = self.load()
            if cur["_version"] != expected_version:
                raise RuntimeError(
                    f"optimistic lock failure: state version {cur['_version']} != "
                    f"expected {expected_version} (concurrent planner run)"
                )
            state = dict(state)
            state["_version"] = expected_version + 1
            tmp = f"{self.path}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self.path)
        finally:
            if lock_fd is not None:
                os.close(lock_fd)
                try:
                    os.unlink(lock_path)
                except FileNotFoundError:
                    pass

    def _break_stale_lock(self, lock_path: str) -> bool:
        pid, ts = -1, None
        try:
            with open(lock_path) as f:
                info = json.load(f)
            pid, ts = int(info.get("pid", -1)), float(info.get("ts", 0.0))
        except (OSError, ValueError):
            try:
                ts = os.path.getmtime(lock_path)
            except OSError:
                return True
        dead = False
        if pid > 0:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                dead = True
            except PermissionError:
                pass
        if dead or (ts is not None and time.time() - ts > self.LOCK_TTL_SEC):
            try:
                os.unlink(lock_path)
            except FileNotFoundError:
                pass
            return True
        return False


def plan(
    specs: dict[str, ExtractionSpec],
    state: PlannerState,
    max_full_refresh: int = 70,
) -> list[PlanEntry]:
    """Build the run plan: toposorted entries, changed specs and their
    transitive dependents in full_refresh mode, the rest incremental.
    The >N-full-refreshes guard mirrors parse_dataset_folder_logic.py:69-75
    (a fat-fingered mass change should fail loudly, not rebuild the
    world)."""
    st = state.load()
    prev = st.get("hashes", {})
    changed = {
        name for name, spec in specs.items() if prev.get(name) != spec.content_hash
    }
    refresh = transitive_dependents(specs, changed)
    if len(refresh) > max_full_refresh:
        raise RuntimeError(
            f"{len(refresh)} tables need full refresh (> {max_full_refresh}); "
            "refusing — split the change or raise max_full_refresh"
        )
    order = toposort(specs)
    return [
        PlanEntry(
            name=n,
            mode="full_refresh" if n in refresh else "incremental",
            content_hash=specs[n].content_hash,
        )
        for n in order
    ]


def commit_plan(specs: dict[str, ExtractionSpec], state: PlannerState, last_pos=None) -> None:
    st = state.load()
    st["hashes"] = {n: s.content_hash for n, s in specs.items()}
    if last_pos is not None:
        last = st.get("_last_pos")
        if last is not None and last_pos < last:
            raise RuntimeError(
                f"logical position must advance monotonically: {last_pos} < {last}"
            )
        st["_last_pos"] = last_pos
    state.save(st, st["_version"])
