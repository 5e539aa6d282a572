"""Communication/computation overlap evidence from scheduled TPU HLO.

The reference overlaps communication with computation explicitly — RoundRobin
lookahead panels and priority hints (``factorization/cholesky/impl.h:218-221,
280-281``).  Here that job belongs to XLA's latency-hiding scheduler: every
collective lowers to an async ``*-start``/``*-done`` pair and the scheduler
moves independent compute between them.  This module turns "XLA will overlap"
into a measurement: AOT-compile a distributed driver for a real TPU topology
(no chips needed) and count the compute ops scheduled inside each collective's
async window.

Post-scheduling ``Compiled.as_text()`` lists instructions in schedule order
(the module is ``is_scheduled=true``), so the instructions between a
``-start`` and its matching ``-done`` are exactly what the chip executes while
the collective is in flight on the ICI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_START = re.compile(
    r"%?(?P<name>[\w.\-]+) = [^=]*"
    r"(?P<kind>all-reduce-start|all-gather-start|reduce-scatter-start|"
    r"collective-permute-start|all-to-all-start)\(")
_DONE = re.compile(
    r"(?:all-reduce-done|all-gather-done|reduce-scatter-done|"
    r"collective-permute-done|all-to-all-done)\("
    r"[^%)]*%?(?P<operand>[\w.\-]+)\)")
_OPCODE = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^=]*?\s([a-z0-9\-]+)\(")
# ops that represent real device work (MXU/VPU), not bookkeeping
_COMPUTE = {"fusion", "dot", "convolution", "cholesky", "triangular-solve",
            "custom-call", "sort"}


@dataclass
class CollectiveWindow:
    kind: str
    name: str
    ops_between: int = 0
    compute_between: int = 0
    compute_kinds: dict = field(default_factory=dict)


def collective_windows(hlo_text: str) -> list[CollectiveWindow]:
    """Scan scheduled HLO text; one entry per async collective pair.

    Instructions are taken in textual (= schedule) order per computation;
    windows never span computations.
    """
    windows: list[CollectiveWindow] = []
    open_windows: dict[str, CollectiveWindow] = {}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") or stripped.startswith("}"):
            # computation boundary: abandon unmatched windows
            open_windows.clear()
            continue
        mdone = _DONE.search(line)
        if mdone is not None:
            w = open_windows.pop(mdone.group("operand"), None)
            if w is not None:
                windows.append(w)
            continue
        mstart = _START.search(line)
        if mstart is not None:
            open_windows[mstart.group("name")] = CollectiveWindow(
                kind=mstart.group("kind"), name=mstart.group("name"))
            continue
        mop = _OPCODE.match(line)
        if mop is not None and open_windows:
            op = mop.group(1)
            for w in open_windows.values():
                w.ops_between += 1
                if op in _COMPUTE:
                    w.compute_between += 1
                    w.compute_kinds[op] = w.compute_kinds.get(op, 0) + 1
    return windows


_SYNC = re.compile(
    r"= [^=]*?\s(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\(")


def overlap_report(hlo_text: str) -> dict:
    """Aggregate overlap statistics for a scheduled module.

    ``sync_collectives`` counts collectives the backend left synchronous
    (no start/done pair — nothing can hide behind those); they are real
    collectives but score zero overlap.
    """
    ws = collective_windows(hlo_text)
    n = len(ws)
    sync = sum(1 for line in hlo_text.splitlines()
               if _SYNC.search(line) and "-start(" not in line
               and "-done(" not in line)
    overlapped = [w for w in ws if w.compute_between > 0]
    return {
        "collectives": n,
        "sync_collectives": sync,
        "with_compute_in_window": len(overlapped),
        "overlap_fraction": (len(overlapped) / n) if n else 0.0,
        "total_compute_ops_hidden": sum(w.compute_between for w in ws),
        "by_kind": _by_kind(ws),
    }


def _by_kind(ws):
    out = {}
    for w in ws:
        d = out.setdefault(w.kind, {"count": 0, "overlapped": 0,
                                    "compute_hidden": 0})
        d["count"] += 1
        d["overlapped"] += int(w.compute_between > 0)
        d["compute_hidden"] += w.compute_between
    return out


def tpu_topology_grid(shape=(2, 4), topology: str | None = None):
    """A Grid over an AOT TPU topology (no attached chips required).

    Raises if the runtime cannot produce a TPU topology description (e.g.
    CPU-only test environments) — callers should catch and skip.
    """
    from jax.experimental import topologies

    from ..parallel.grid import Grid

    p, q = shape
    topology = topology or f"v5e:{p}x{q}"
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    return Grid(shape, devices=list(topo.devices))


def compile_for_grid(fn, grid, *abstract_args):
    """AOT-compile ``fn`` for ``grid``'s (possibly detached) devices."""
    import jax

    return jax.jit(fn).lower(*abstract_args).compile()
