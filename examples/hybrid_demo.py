"""End-to-end hybrid query demo (the reference's comparator_demo /
GETTING_STARTED flow, Spark-first).

Builds a sensor quad log, registers a hybrid Janus-QL query, warms the
baseline from the historical window, replays the stream into the live
side, and prints anomaly-filtered live results as they fire.

    python examples/hybrid_demo.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from janus_spark import get_spark
from janus_spark.engine import JanusEngine
from janus_spark.sources.melt import melt_sensor_fixture
from janus_spark.streaming import replay_quads

QUERY = """
PREFIX ex: <http://example.org/>
PREFIX janus: <https://janus.rs/fn#>
REGISTER RStream <out> AS
SELECT ?sensor ?temp ?mean
FROM NAMED WINDOW ex:live ON STREAM ex:sensors [RANGE 2000 STEP 1000]
FROM NAMED WINDOW ex:hist ON LOG ex:sensors [START 100 END 5000]
USING BASELINE ex:hist AGGREGATE
WHERE {
  WINDOW ex:live { ?sensor ex:temperature ?temp . }
  WINDOW ex:hist { ?sensor ex:temperature ?mean . }
  ?sensor <https://janus.rs/baseline#mean> ?mean .
  FILTER(janus:abs_diff(?temp, ?mean) > 2)
}
"""


def main() -> None:
    spark = get_spark("hybrid_demo")
    spark.sparkContext.setLogLevel("ERROR")
    quads = melt_sensor_fixture(spark, 100)  # ts 100..10000

    engine = JanusEngine(spark, quads)
    qid = engine.register_query(QUERY)
    print(f"registered {qid}: status={engine.get_query(qid).status}")

    with tempfile.TemporaryDirectory() as tmp:
        runner = engine.start_live(qid, f"{tmp}/buffer")  # warms baseline
        print(f"baseline warmed: status={engine.get_query(qid).status}")

        # replay the "future" part of the log as the live stream
        n = replay_quads(quads.where("ts > 5000"), runner, batch_ms=1000)
        print(f"replayed {n} micro-batches")

        for batch in runner.sink.batches:
            if batch["rows"]:
                print(f"window [{batch['window_start']}, {batch['window_end']}):")
                for row in batch["rows"][:5]:
                    print(
                        f"  ANOMALY {row['sensor']}: temp={row['temp']} "
                        f"baseline mean={row['mean']}"
                    )


if __name__ == "__main__":
    main()
