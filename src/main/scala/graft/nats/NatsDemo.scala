package graft.nats

import java.util.concurrent.atomic.AtomicBoolean

/** Helpers for self-contained NATS demos/tests: because core NATS is
  * fire-and-forget (no replay, SURVEY §7.4.1), a one-shot query only sees
  * messages published while its subscription is live — the same timing
  * sensitivity the reference's own example handles with a concurrent paced
  * publisher task (reference examples/simple_query.rs:36-49).
  */
object NatsDemo {

  /** Publish `msgs` cyclically until stopped (or 30 s). Any n consecutive
    * messages from a cycle of n distinct rows are the n distinct rows, so
    * a `LIMIT n` one-shot read is deterministic regardless of where in the
    * cycle its subscription starts.
    */
  def cyclicPublisher(url: String, subject: String, msgs: Seq[String]): AtomicBoolean = {
    val stop = new AtomicBoolean(false)
    val t = new Thread(() => {
      val conn = NatsTransport.connect(url)
      val deadline = System.currentTimeMillis() + 30000
      while (!stop.get() && System.currentTimeMillis() < deadline) {
        msgs.foreach { m =>
          if (!stop.get()) { conn.publish(subject, m.getBytes); Thread.sleep(5) }
        }
      }
    })
    t.setDaemon(true)
    t.start()
    stop
  }

  /** Block until a subscriber is live on the subject (memory:// bus only). */
  def awaitSubscriber(url: String, subject: String, timeoutMs: Long = 10000): Unit = {
    val busId = url.stripPrefix("memory://")
    val deadline = System.currentTimeMillis() + timeoutMs
    while (InMemoryBus.subscriberCount(busId, subject) == 0) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(s"no subscriber on $subject within ${timeoutMs}ms")
      Thread.sleep(10)
    }
  }
}
