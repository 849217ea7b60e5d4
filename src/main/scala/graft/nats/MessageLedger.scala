package graft.nats

/** Ingest buffer configuration, mirroring the reference's
  * BatchBufferConfig defaults (reference src/batch_buffer.rs:22-28).
  *
  * @param batchSize      max rows admitted into one micro-batch (ref batch_size)
  * @param flushTimeoutMs admit a partial batch once this much time has
  *                       passed since the last admission (ref batch_timeout_ms)
  * @param maxBufferSize  hard cap on buffered-but-unconsumed rows. The
  *                       reference declares 10,000 but never enforces it
  *                       (SURVEY §2.C3); here it is real: `append` refuses
  *                       rows past the cap and counts them as dropped.
  */
final case class LedgerConfig(
    batchSize: Int = 1000,
    flushTimeoutMs: Long = 1000L,
    maxBufferSize: Int = 10000)

/** Driver-side, thread-safe, offset-indexed row ledger — the Spark analog
  * of the reference's BatchBuffer + flush policy (src/batch_buffer.rs:41-209)
  * re-shaped for the micro-batch model (Spark's socket-source pattern):
  *
  *   - the NATS subscriber thread `append`s raw payloads as they arrive;
  *   - the MicroBatchStream calls `admit` from `latestOffset` — the flush
  *     policy (size OR timeout, src/batch_buffer.rs:73-86) decides whether
  *     a new batch is declared and how many rows it may contain;
  *   - `rowsBetween(start, end)` snapshots a planned batch's payloads so
  *     they can ride to executors inside InputPartitions;
  *   - `trim(committedOffset)` releases memory once Spark commits a batch.
  *
  * Offsets are cumulative accepted-message counts, monotone for the life
  * of the ledger. Payloads are buffered raw; decoding happens in the
  * executor-side PartitionReader so parse work scales out with tasks.
  *
  * Overflow policy: drop-newest with a counter (`droppedRows`). A streaming
  * source must not block its transport callback, and dropping the newest
  * keeps already-admitted offsets stable. This is the enforced version of
  * the reference's declared-but-dead max_buffer_size intent
  * (src/batch_buffer_test.rs:78-100).
  */
final class MessageLedger(config: LedgerConfig) {
  require(config.batchSize > 0 && config.maxBufferSize > 0)

  // base = offset of rows.head; rows holds [base, base + rows.size)
  private var base = 0L
  private val rows = scala.collection.mutable.ArrayDeque.empty[String]
  private var dropped = 0L
  private var lastAdmitMs = Long.MinValue

  /** Append one raw payload; false (and counted) when the buffer is full. */
  def append(payload: String): Boolean = synchronized {
    if (rows.size >= config.maxBufferSize) { dropped += 1; false }
    else { rows.append(payload); true }
  }

  /** Total rows ever accepted = the offset one past the newest row. */
  def endOffset: Long = synchronized { base + rows.size }

  /** Rows accepted but not yet trimmed (current memory footprint). */
  def bufferedCount: Int = synchronized { rows.size }

  def droppedRows: Long = synchronized { dropped }

  /** Flush-policy admission (reference should_create_batch,
    * src/batch_buffer.rs:73-86): from `fromOffset`, declare the next batch
    * end. A full batch is admitted as soon as batchSize rows are available;
    * a partial batch only after flushTimeoutMs of admission silence; else
    * the offset does not advance (no empty batches).
    *
    * `maxBatches` lifts the per-trigger admission from one batch (the
    * parity default — one RecordBatch per poll) to up to that many FULL
    * batches. batchSize stays the batch granularity (the reference's
    * batch_size is RecordBatch size, and its executor consumes every
    * batch its channel holds, src/executor.rs:74-130) while a deep
    * backlog drains at transport speed instead of one batch per trigger
    * interval — the same backlog knob as Kafka's maxOffsetsPerTrigger.
    */
  def admit(fromOffset: Long, nowMs: Long, maxBatches: Int = 1): Long = synchronized {
    val available = base + rows.size - fromOffset
    if (lastAdmitMs == Long.MinValue) lastAdmitMs = nowMs // policy clock starts at first poll
    val fullBatches = math.min(available / config.batchSize, math.max(1, maxBatches).toLong)
    val admitted =
      if (fullBatches > 0) fullBatches * config.batchSize
      else if (available > 0 && nowMs - lastAdmitMs >= config.flushTimeoutMs) available
      else 0L
    if (admitted > 0) lastAdmitMs = nowMs
    fromOffset + admitted
  }

  /** Snapshot payloads in [start, end) for executor shipment. */
  def rowsBetween(start: Long, end: Long): Array[String] = synchronized {
    require(start >= base, s"offset $start already trimmed (base $base)")
    val hi = math.min(end, base + rows.size)
    if (hi <= start) Array.empty
    else rows.slice((start - base).toInt, (hi - base).toInt).toArray
  }

  /** Release rows below `upTo` after Spark commits the batch. */
  def trim(upTo: Long): Unit = synchronized {
    val n = math.min(math.max(upTo - base, 0L), rows.size.toLong).toInt
    rows.dropInPlace(n)
    base += n
  }
}
