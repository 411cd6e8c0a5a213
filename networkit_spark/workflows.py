"""Convenience workflows composed from engine functions.

Reference: /root/reference/networkit/workflows.py (extractLargestComponent
:17-39, batch :41-74). ``extract_largest_component`` lives with the
components operators (operators/components.py:232) and is re-exported here
for discoverability; ``batch`` is the multi-graph directory sweep.
"""

from __future__ import annotations

import csv
import fnmatch
import os
import time
from typing import Callable, Iterable, Optional

from .operators.components import extract_largest_component  # noqa: F401

_DEFAULT_READERS = {
    "metis": "read_metis",
    "snap": "read_snap",
    "gml": "read_gml",
    "graphml": "read_graphml",
    "edgelist": "read_edge_list",
}


def batch(
    spark,
    graph_dir: str,
    match: str,
    fmt: str,
    function: Callable,
    out_path: str,
    header: Optional[Iterable[str]] = None,
) -> list:
    """Read every graph file under ``graph_dir`` matching ``match`` (fnmatch
    pattern), apply ``function(graph) -> list/tuple``, and append one TSV row
    per graph to ``out_path`` (reference workflows.py:41-74 batch).

    ``fmt`` is one of metis/snap/gml/graphml/edgelist (dispatched to the
    sources readers). The per-graph work is fully distributed; only the
    one-row-per-graph result lands on the driver, so a directory of
    thousands of graphs streams through without accumulating state.
    Returns the collected rows (filename, elapsed seconds, *function row).
    """
    from .sources import edgelist as _el
    from .sources import formats as _fmts

    reader_name = _DEFAULT_READERS.get(fmt)
    if reader_name is None:
        raise ValueError(f"unknown format {fmt!r}; one of {sorted(_DEFAULT_READERS)}")
    reader = getattr(_fmts, reader_name, None) or getattr(_el, reader_name)

    rows = []
    with open(out_path, "w") as out_file:
        writer = csv.writer(out_file, delimiter="\t")
        if header:
            writer.writerow(list(header))
        for root, _, filenames in os.walk(graph_dir):
            for filename in sorted(filenames):
                if not fnmatch.fnmatch(filename, match):
                    continue
                graph_path = os.path.join(root, filename)
                t0 = time.time()
                g = reader(spark, graph_path)
                result = function(g)
                elapsed = round(time.time() - t0, 4)
                row = [filename, elapsed, *list(result)]
                writer.writerow(row)
                rows.append(row)
    return rows
