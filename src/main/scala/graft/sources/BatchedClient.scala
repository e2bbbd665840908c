package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** The S1 live-ingest shape (SURVEY §2.1): the reference pulls 50 records
  * per HTTP request (`dags/conf.py:8`, chunking at `dags/openalex.py:20-38`
  * — F22). In-engine, the client runs inside `mapPartitions`: each
  * partition batches its keys into `batchSize` groups and issues one
  * fetch per group, so request count scales with data volume while
  * connection setup amortizes per partition, and no driver-side loop ever
  * sees the keys.
  *
  * The transport is pluggable (and stubbed in tests — this container has
  * no egress); the partition/batch plumbing is the real, tested part.
  */
object BatchedClient {

  /** Fetch `ids` through `fetch`, batched per partition. `fetch` is called
    * once per ≤`batchSize` group with the whole group — the reference's
    * one-request-per-50-ids contract. */
  def fetchBatched(ids: Dataset[String], batchSize: Int)(
      fetch: Seq[String] => Seq[(String, String)]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        // A real client would hold one HTTP connection per partition and
        // POST the id group here.
        fetch(group)
      }
    }.toDF("id", "payload")
  }
}
