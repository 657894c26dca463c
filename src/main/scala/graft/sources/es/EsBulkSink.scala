package graft.sources.es

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Write side of the ES round-trip — the engine's results flowing back
  * into an index via the public `_bulk` API (the reference's eland
  * `pandas_to_eland` round-trip, re-expressed as a distributed sink).
  *
  * Scale shape: `foreachPartition` — every task streams ITS partition
  * as `batch`-sized NDJSON bulk bodies over its own JDK HTTP client,
  * so write parallelism equals the upstream partitioning (repartition
  * before calling to choose the indexing fan-in; ES bulk sizing folk
  * wisdom caps bodies at a few MB, which `batch` controls). Each
  * bulk response is checked for `errors` — a failed item fails the
  * TASK (and Spark retries it), never silently drops rows.
  *
  * `idCol`: optional document-id column (upserts become idempotent —
  * the retry-safety condition for a task-retried distributed write);
  * without it ES assigns ids and retries can duplicate (documented ES
  * at-least-once behavior).
  */
object EsBulkSink {

  def write(df: DataFrame, nodes: String, index: String,
            idCol: Option[String] = None, batch: Int = 500): Unit = {
    val schema = df.schema
    val idIdx = idCol.map { c =>
      val i = schema.fieldNames.indexOf(c)
      require(i >= 0, s"id column '$c' not in ${schema.fieldNames.toSeq}")
      // Up-front null probe BEFORE any bulk request: the in-partition
      // guard below fires only after earlier buffers flushed, so on
      // exhausted task retries it would leave the very partial write
      // idCol exists to prevent. A limit(1) probe over the (column-
      // pruned) id column is cheap next to the indexing job itself and
      // fails the whole write with zero documents sent.
      // COST CONTRACT: the probe executes the upstream lineage an
      // extra time. For a file-backed input that is a pruned scan of
      // one column; for an expensive COMPUTED input it roughly doubles
      // the job — cache()/checkpoint() such inputs before calling
      // write. A non-deterministic uncached input can additionally
      // pass the probe yet produce a null on the write's recompute —
      // the in-partition guard below still fails that task, but after
      // earlier buffers flushed; determinism (or caching) is the
      // caller's side of the idempotency bargain.
      require(df.select(df.col(c)).filter(df.col(c).isNull).isEmpty,
        s"EsBulkSink: id column '$c' contains nulls — ids must be " +
          "non-null for idempotent (task-retry-safe) writes; no bulk " +
          "request was sent")
      i
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      val mapper = new ObjectMapper()
      val http = EsScrollSource.httpClient() // bounded connect timeout
      def flush(buf: StringBuilder, n: Int): Unit = if (n > 0) {
        val req = HttpRequest.newBuilder(URI.create(s"$nodes/$index/_bulk"))
          .header("Content-Type", "application/x-ndjson")
          .timeout(EsScrollSource.RequestTimeout)
          .POST(HttpRequest.BodyPublishers.ofString(buf.toString,
            StandardCharsets.UTF_8))
          .build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(
            s"ES bulk ${resp.statusCode()}: ${resp.body().take(500)}")
        val parsed = mapper.readTree(resp.body())
        if (parsed.path("errors").asBoolean(false))
          throw new java.io.IOException(
            s"ES bulk reported item errors: ${resp.body().take(500)}")
      }
      val buf = new StringBuilder
      var n = 0
      rows.foreach { row =>
        val action = mapper.createObjectNode()
        val meta = action.putObject("index")
        idIdx.foreach { i =>
          // defense-in-depth behind the driver-side pre-probe: a
          // non-deterministic upstream could produce a null only on
          // the write recompute; failing beats indexing under an ES
          // auto-generated _id, which would void retry-idempotency
          if (row.isNullAt(i)) throw new IllegalArgumentException(
            s"EsBulkSink: null value in id column '${idCol.get}' — " +
              "ids must be non-null for idempotent (task-retry-safe) writes")
          meta.put("_id", row.get(i).toString)
        }
        val doc = mapper.createObjectNode()
        var i = 0
        while (i < schema.length) {
          val f = schema(i)
          def scalarInto(arr: com.fasterxml.jackson.databind.node.ArrayNode,
                         dt: DataType, v: Any): Unit = dt match {
            case LongType => arr.add(v.asInstanceOf[Long])
            case IntegerType => arr.add(v.asInstanceOf[Int])
            case DoubleType => arr.add(v.asInstanceOf[Double])
            case FloatType => arr.add(v.asInstanceOf[Float])
            case BooleanType => arr.add(v.asInstanceOf[Boolean])
            case StringType => arr.add(v.toString)
            case dt => throw new UnsupportedOperationException(
              s"EsBulkSink: unsupported array element type $dt for " +
                s"column ${f.name}")
          }
          if (row.isNullAt(i)) doc.putNull(f.name)
          else f.dataType match {
            case LongType => doc.put(f.name, row.getLong(i))
            case IntegerType => doc.put(f.name, row.getInt(i))
            case DoubleType => doc.put(f.name, row.getDouble(i))
            case FloatType => doc.put(f.name, row.getFloat(i))
            case BooleanType => doc.put(f.name, row.getBoolean(i))
            case StringType => doc.put(f.name, row.getString(i))
            // ES's native multi-value field shape: a JSON array (null
            // elements are dropped by ES at index time anyway, so they
            // round-trip as absent — serialize them as JSON nulls and
            // let the server apply its own contract)
            case ArrayType(elem, _) =>
              val arr = doc.putArray(f.name)
              row.getSeq[Any](i).foreach { v =>
                if (v == null) arr.addNull() else scalarInto(arr, elem, v)
              }
            case dt => throw new UnsupportedOperationException(
              s"EsBulkSink: unsupported dtype $dt for column ${f.name}")
          }
          i += 1
        }
        buf.append(action.toString).append('\n')
          .append(doc.toString).append('\n')
        n += 1
        if (n >= batch) { flush(buf, n); buf.clear(); n = 0 }
      }
      flush(buf, n)
    }
  }
}
