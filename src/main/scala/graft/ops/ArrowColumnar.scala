package graft.ops

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.Float8Vector
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Arrow columnar escape hatch for codec-style per-partition work.
  *
  * PySpark's `mapInArrow` hands each partition to a worker as Arrow
  * record batches; the Scala `Dataset.mapInArrow` overload is the plumbing
  * for exactly that Python worker (it takes a PythonUDF column), so a pure
  * Scala/JVM library expresses the same seam directly: `mapPartitions`
  * that packs rows into Arrow vectors, runs a columnar kernel per batch,
  * and streams rows back out. The point of the Arrow layout is the
  * boundary it creates — image/audio codecs, SIMD kernels, or any native
  * library that consumes Arrow buffers (via Arrow C Data Interface) can
  * process the batch without per-row JVM marshalling. This is the
  * documented seam for the Multimodal frame-decode work that needs codec
  * libraries not present in this container.
  *
  * Scale shape: one allocator + one reused vector per task, bounded batch
  * size (so executor memory is `batchSize × width`, not partition size),
  * and a task-completion hook guarantees the off-heap buffers are released
  * even if the downstream iterator stops early (e.g. under a LIMIT).
  */
object ArrowColumnar {

  /** Append `out` = kernel(`in`) computed batch-wise through an Arrow
    * Float8Vector. The kernel transforms the vector IN PLACE and must
    * preserve the validity (null) bitmap semantics it finds: null slots
    * stay null in the output column.
    */
  def mapDoubleBatches(df: DataFrame, in: String, out: String,
      batchSize: Int = 4096)(kernel: Float8Vector => Unit): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val inIdx = df.schema.fieldIndex(in)
    require(df.schema(inIdx).dataType == DoubleType,
      s"column $in must be DOUBLE, got ${df.schema(inIdx).dataType}")
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(out, DoubleType, nullable = true))
    df.mapPartitions { rows =>
      val allocator = new RootAllocator()
      val vec = new Float8Vector("batch", allocator)
      var closed = false
      def closeBuffers(): Unit = if (!closed) { closed = true; vec.close(); allocator.close() }
      // buffers are off-heap: close on task end, not GC — covers both
      // normal exhaustion and early termination by the consumer
      val taskCtx = Option(TaskContext.get())
      taskCtx.foreach(_.addTaskCompletionListener[Unit](_ => closeBuffers()))
      // allocate ONCE at full batch capacity and reset() per batch:
      // allocateNew in the loop would free + re-malloc the off-heap
      // buffers for every batch (hundreds of cycles on a large partition)
      vec.allocateNew(batchSize)
      val out = rows.grouped(batchSize).flatMap { batch =>
        vec.reset()
        var i = 0
        batch.foreach { r =>
          if (r.isNullAt(inIdx)) vec.setNull(i) else vec.setSafe(i, r.getDouble(inIdx))
          i += 1
        }
        vec.setValueCount(batch.size)
        kernel(vec)
        batch.iterator.zipWithIndex.map { case (r, j) =>
          val v: Any = if (vec.isNull(j)) null else vec.get(j)
          Row.fromSeq(r.toSeq :+ v)
        }
      }
      if (taskCtx.isDefined) out
      else new Iterator[Row] {
        // No task context (driver-local run, e.g. a LocalTableScan feeding
        // the mapPartitions directly): close on exhaustion, and on any
        // exception thrown by the read loop or the kernel. A consumer that
        // stops early WITHOUT exhausting or failing (LIMIT/take) has no
        // close signal here — a known, accepted leak for driver-local
        // runs only; every executor-side task has the completion listener.
        private def guarded[A](body: => A): A =
          try body catch { case t: Throwable => closeBuffers(); throw t }
        def hasNext: Boolean = guarded { val h = out.hasNext; if (!h) closeBuffers(); h }
        def next(): Row = guarded(out.next())
      }
    }(Encoders.row(outSchema))
  }

  /** A real kernel through the seam: vectorized standardization
    * `out = (in − mean) / std` as a tight loop over the Arrow buffer — the
    * shape a SIMD/native normalization kernel takes (contiguous doubles in,
    * contiguous doubles out, validity bitmap respected). `mean`/`std` are
    * corpus-level scalars the caller computes with one aggregate first.
    * Equivalence with the expression twin `(col − mean) / std` is exact:
    * both are the same two IEEE-754 double ops per element
    * (ArrowColumnarSpec asserts bit-identity). */
  def zscore(df: DataFrame, in: String, out: String, mean: Double, std: Double,
      batchSize: Int = 4096): DataFrame = {
    require(std != 0.0 && !std.isNaN, s"std must be non-zero and finite, got $std")
    mapDoubleBatches(df, in, out, batchSize) { vec =>
      val n = vec.getValueCount
      var i = 0
      while (i < n) {
        if (!vec.isNull(i)) vec.set(i, (vec.get(i) - mean) / std)
        i += 1
      }
    }
  }
}
