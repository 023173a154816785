"""Custom Python Data Source WRITE path: a ``word: count`` line sink.

The reference's only sink is the final print loop emitting ``word:
count`` lines in ascending key order (reference ``1.cpp:322-327``).
``sinks/writers.format_console`` reproduces it driver-side for parity
fixtures; this module is the DISTRIBUTED twin — a ``DataSourceWriter``
(``pyspark.sql.datasource``) so the same format scales to a 1000-task
write with Spark's commit protocol:

* each task writes its partition to a uniquely-named temp file and
  returns the path in its ``WriterCommitMessage`` — task retries and
  speculative duplicates each write their OWN temp file;
* ``commit()`` runs once on the driver with exactly one message per
  successful task and atomically renames the winners into place —
  losers are never renamed, so the output directory only ever holds
  committed data (the same two-phase shape as Hadoop's
  FileOutputCommitter);
* ``abort()`` removes any temp files so a failed job leaves nothing.

Sorted output: a global ``word: count`` file order is a presentation
concern — write after ``repartitionByRange(key).sortWithinPartitions``
and the lexicographically-named part files concatenate to the
reference's ascending order (asserted in tests/test_cli.py twin).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _Committed(WriterCommitMessage):
    temp_path: str
    final_name: str
    rows: int


class _WordCountWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wcsink requires a path")
        self.key = options.get("key", "word")
        self.value = options.get("value", "cnt")
        self.overwrite = overwrite

    def write(self, iterator) -> _Committed:  # runs on executors
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)
        # temp name is attempt-unique: a speculative twin writes its own
        # file and only the attempt whose message reaches commit() wins
        temp = os.path.join(self.path, f"_temp-{pid:05d}-{attempt}")
        rows = 0
        with open(temp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"{row[self.key]}: {row[self.value]}\n")
                rows += 1
        return _Committed(temp_path=temp, final_name=f"part-{pid:05d}.txt", rows=rows)

    def commit(self, messages) -> None:  # runs once on the driver
        for m in messages:
            os.replace(m.temp_path, os.path.join(self.path, m.final_name))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class WordCountSink(DataSource):
    """``df.write.format("wcsink").option("path", p).save()`` — emits
    the reference's ``word: count`` lines, one text file per partition,
    under a two-phase task-commit protocol."""

    @classmethod
    def name(cls) -> str:
        return "wcsink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _WordCountWriter(dict(self.options), overwrite)


def register_wordcount_sink(spark) -> None:
    spark.dataSource.register(WordCountSink)


def read_sink_lines(path: str) -> list[str]:
    """Concatenate the committed part files in name order (range-
    partitioned + sorted input ⇒ globally ascending lines)."""
    lines: list[str] = []
    for name in sorted(os.listdir(path)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(path, name), encoding="utf-8") as f:
            lines.extend(line.rstrip("\n") for line in f)
    return lines
