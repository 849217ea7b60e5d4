package graft.nats

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.CopyOnWriteArrayList

/** Minimal NATS client surface the engine needs — the shape of the
  * reference's connection helpers (reference src/nats_connection.rs:4-12:
  * `connect(url) -> Client`, `subscribe(client, subject) -> Subscriber`)
  * and of jnats' `Connection`/`Dispatcher`.
  *
  * Core-NATS semantics are preserved: fire-and-forget, no replay — a
  * subscriber only sees messages published while it is subscribed
  * (SURVEY §7.4.1; visible in the reference's own publish-then-query
  * timing, tests/integration_test.rs:24-53).
  */
trait NatsConnection extends AutoCloseable {
  def publish(subject: String, payload: Array[Byte]): Unit
  def subscribe(subject: String)(handler: Array[Byte] => Unit): NatsSubscription
}

trait NatsSubscription extends AutoCloseable

/** URL-scheme router. `memory://<busId>` connects to the in-process bus
  * below; `nats://host:port` is reserved for a real jnats-backed
  * connection (the client jar is not bundled in this offline build — the
  * DSv2 machinery above this interface is transport-agnostic, which is
  * the point of the seam).
  */
object NatsTransport {
  def connect(url: String): NatsConnection =
    if (url.startsWith("memory://")) InMemoryBus.connect(url.stripPrefix("memory://"))
    else if (url.startsWith("nats://")) throw new UnsupportedOperationException(
      s"jnats transport not bundled in this environment: $url " +
        "(use memory://<busId>; the source machinery is identical)")
    else throw new IllegalArgumentException(s"Unsupported NATS url: $url")
}

/** In-process fire-and-forget pub/sub broker, keyed by bus id so
  * independent tests/queries don't cross-talk. Exact-subject matching
  * (the reference subscribes to one literal subject,
  * src/executor.rs:94 — no wildcard support needed for parity).
  *
  * Delivery is synchronous on the publisher thread — the Spark-side
  * subscriber handler (MessageLedger.append) is O(1) and non-blocking,
  * matching NATS' requirement that callbacks not stall the client.
  */
object InMemoryBus {
  private final class Sub(val subject: String, val handler: Array[Byte] => Unit)

  private final class Bus {
    val subs = new CopyOnWriteArrayList[Sub]()
  }

  private val buses = new ConcurrentHashMap[String, Bus]()

  /** Number of live subscriptions on a subject (lets demo publishers
    * stop once their consumer is gone). */
  def subscriberCount(busId: String, subject: String): Int = {
    val bus = buses.get(busId)
    if (bus == null) 0
    else {
      var n = 0
      bus.subs.forEach(s => if (s.subject == subject) n += 1)
      n
    }
  }

  def connect(busId: String): NatsConnection = new NatsConnection {
    private val bus = buses.computeIfAbsent(busId, _ => new Bus)

    def publish(subject: String, payload: Array[Byte]): Unit =
      bus.subs.forEach(s => if (s.subject == subject) s.handler(payload))

    def subscribe(subject: String)(handler: Array[Byte] => Unit): NatsSubscription = {
      val sub = new Sub(subject, handler)
      bus.subs.add(sub)
      () => { bus.subs.remove(sub); () }
    }

    def close(): Unit = () // bus outlives connections, like a broker
  }
}
