package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Counts whole-stage-codegen compile failures so the bench is
  * self-diagnosing: a janino "Code grows beyond 64 KB" (or any other
  * compile failure) silently drops the stage to the per-row interpreted
  * path — correctness-invisible, 10×+ slower, and a scale-killer at
  * 100×. Round 2 shipped exactly that regression and it only surfaced
  * because sbt leaked stderr into the bench tail; this appender makes
  * it a first-class, per-query metric in BENCH json ("codegen_errors").
  *
  * Implementation: a log4j2 appender on the root logger counting ERROR
  * events whose message matches the CodeGenerator failure signatures
  * ("failed to compile" / "grows beyond 64 KB"). Log-scrape rather than
  * listener because Spark exposes no public codegen-fallback callback;
  * the signature strings are stable across Spark 3.x/4.x.
  */
object CodegenErrors {

  private val count = new AtomicLong(0)

  private object Counter extends AbstractAppender("graft-codegen-errors",
      null, null, true, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val m = event.getMessage.getFormattedMessage
      if (m != null && (m.contains("ailed to compile") ||
          m.contains("grows beyond 64 KB")))
        count.incrementAndGet()
    }
  }

  /** Attach the counter to the root log4j2 logger (idempotent). Events
    * from loggers without their own config (CodeGenerator included)
    * route through the root LoggerConfig, so this sees them all. */
  def install(): Unit = synchronized {
    val root = LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    if (!root.getAppenders.containsKey(Counter.getName)) {
      Counter.start()
      root.addAppender(Counter)
    }
  }

  /** Monotonic failure count since JVM start; diff around a query run
    * to attribute failures per query. */
  def snapshot(): Long = count.get()
}
