"""Algorithm-engineering harnesses: strong / weak scaling sweeps.

Reference: /root/reference/networkit/engineering.py (strongScaling :12-44,
weakScaling :46-73). The reference varies OpenMP thread counts inside one
process; the Spark analog varies the session's core count. In this sandbox
that means stopping and recreating the ``local[n]`` session per level
(``session_factory``); on a real cluster the same sweep is driven by
spark-submit with different ``--num-executors`` — tools/scaling_bench.py is
the subprocess-isolated variant used for the committed BENCH/scaling.json
gate numbers (alternating rounds, min-superstep estimator, pinned data
layout). This module is the lightweight in-library counterpart for
exploratory sweeps.
"""

from __future__ import annotations

import csv
import time
from typing import Callable, Iterable, Optional, Sequence


def _default_session_factory(cpus: int):
    from pyspark.sql import SparkSession

    from .session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    return get_spark(app_name=f"nk-scaling-{cpus}", cpus=cpus)


def strong_scaling(
    algorithm: Callable,
    thread_sequence: Sequence[int],
    input_title: str = "",
    repetitions: int = 1,
    out_path: Optional[str] = None,
    session_factory: Callable = _default_session_factory,
) -> list:
    """Fixed input, varying parallelism (engineering.py:12-44).

    ``algorithm(spark) -> label`` must build its input FROM the session it is
    given (so each level re-reads at that parallelism) and run to completion
    (materialize with count()/collect()). Returns
    ``[{algo, input, threads, time}, ...]``; optionally TSV'd to ``out_path``.
    """
    data = []
    for n_threads in thread_sequence:
        spark = session_factory(n_threads)
        for _ in range(repetitions):
            t0 = time.time()
            label = algorithm(spark)
            data.append(
                {
                    "algo": str(label),
                    "input": input_title,
                    "threads": int(n_threads),
                    "time": round(time.time() - t0, 4),
                }
            )
    _maybe_write(data, out_path)
    return data


def weak_scaling(
    algorithm: Callable,
    thread_sequence: Sequence[int],
    input_sequence: Sequence,
    input_titles: Optional[Iterable[str]] = None,
    repetitions: int = 1,
    out_path: Optional[str] = None,
    session_factory: Callable = _default_session_factory,
) -> list:
    """Input size grows with parallelism (engineering.py:46-73):
    ``algorithm(spark, input) -> label`` runs once per (input, threads) pair.
    """
    if len(input_sequence) != len(thread_sequence):
        raise ValueError(
            f"weak_scaling: {len(input_sequence)} inputs vs "
            f"{len(thread_sequence)} thread levels — the sequences pair "
            "element-wise (zip would silently truncate the sweep)"
        )
    titles = list(input_titles) if input_titles else [str(i) for i in input_sequence]
    if len(titles) != len(input_sequence):
        raise ValueError(
            f"weak_scaling: {len(titles)} input_titles for "
            f"{len(input_sequence)} inputs"
        )
    data = []
    for i, (inp, n_threads) in enumerate(zip(input_sequence, thread_sequence)):
        spark = session_factory(n_threads)
        for _ in range(repetitions):
            t0 = time.time()
            label = algorithm(spark, inp)
            data.append(
                {
                    "algo": str(label),
                    "input": titles[i],
                    "threads": int(n_threads),
                    "time": round(time.time() - t0, 4),
                }
            )
    _maybe_write(data, out_path)
    return data


def _maybe_write(data: list, out_path: Optional[str]) -> None:
    if not out_path:
        return
    with open(out_path, "w") as f:
        writer = csv.DictWriter(
            f, fieldnames=["algo", "input", "threads", "time"], delimiter="\t"
        )
        writer.writeheader()
        for row in data:
            writer.writerow(row)
