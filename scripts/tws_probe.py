"""Round-probe for Spark 4's ``transformWithStateInPandas`` (VERDICT r5
item 8): the T-8 arbitrary-state tier would migrate from
``applyInPandasWithState`` to the newer API once it works in this
environment, but the TransformWithStateInPySpark driver worker has
crashed here every round so far — even on a STATELESS echo with the
RocksDB state-store provider set, which the API requires.

Run once per round:  python scripts/tws_probe.py
Prints ONE line:  ``tws_probe: PASS`` or ``tws_probe: FAIL <signature>``
and appends nothing — the one-line status goes into COVERAGE.md's T-8
row by hand.  Migration policy (unchanged): move the stateful tier only
after the probe passes in TWO consecutive rounds.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("tws-probe")
        .config("spark.sql.shuffle.partitions", "2")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    class Echo(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            pass

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                yield pd.DataFrame({"key": [key[0]] * len(pdf)})

        def close(self) -> None:
            pass

    try:
        # Batch-mode TWS first: same state-store machinery, and a
        # failure surfaces synchronously with a typed signature (the
        # streaming form can report only an empty sink).  r6 signature:
        # CANNOT_LOAD_STATE_STORE.UNCATEGORIZED (SQLSTATE 58030) from
        # the RocksDB provider, batch AND streaming.
        batch = (
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
            .groupBy("k")
            .transformWithStateInPandas(
                Echo(),
                outputStructType="key long",
                outputMode="append",
                timeMode="none",
            )
            .collect()
        )
        if len(batch) != 2:
            print(f"tws_probe: FAIL batch-wrong-row-count n={len(batch)}")
            return 1
        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src")
            os.makedirs(src)
            spark.createDataFrame(
                [(1, 10), (2, 20)], "k long, v long"
            ).write.parquet(os.path.join(src, "b1.parquet"))
            sdf = spark.readStream.schema("k long, v long").parquet(src)
            out = sdf.groupBy("k").transformWithStateInPandas(
                Echo(),
                outputStructType="key long",
                outputMode="append",
                timeMode="none",
            )
            q = (
                out.writeStream.format("memory")
                .queryName("tws_probe")
                .outputMode("append")
                .option("checkpointLocation", os.path.join(tmp, "ck"))
                .trigger(availableNow=True)
                .start()
            )
            finished = q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()
            if not finished:
                q.stop()
                print("tws_probe: FAIL timeout-no-progress-120s")
                return 1
            n = spark.sql("SELECT count(*) AS n FROM tws_probe").first().n
        if n == 2:
            print("tws_probe: PASS")
            return 0
        print(f"tws_probe: FAIL wrong-row-count n={n}")
        return 1
    except Exception as e:  # noqa: BLE001 — the crash IS the result
        import re

        msg = str(e)
        cls = re.search(r"\[([A-Z_.]+)\]", msg)
        state = re.search(r"SQLSTATE: \w+", msg)
        if cls:
            sig = cls.group(1) + (f" {state.group(0)}" if state else "")
        else:
            sig = f"{type(e).__name__}: {msg.splitlines()[0][:160]}"
        print(f"tws_probe: FAIL {sig}")
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
