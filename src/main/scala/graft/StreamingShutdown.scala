package graft

/** Deterministic state-store teardown for the scale smokes (round 21,
  * VERDICT r20 #6): after the r20 st6 sf100 RocksDB run, the EXITING
  * JVM segfaulted inside rocksdbjni's native logger callback
  * (`LoggerJniCallback::Logv` during store close — the known RocksDB
  * JNI shutdown race between the native close path and the GC'd Java
  * callback object). Closing every loaded provider EXPLICITLY, while
  * the JVM is quiescent and well before shutdown-hook/class-unload
  * churn, takes the native close out of the fragile exit window.
  *
  * `StateStore.stop()` is `private[sql]` in Scala source but public in
  * bytecode (Scala package-private compiles to public), so plain Java
  * reflection reaches it without shading or a package-injection hack.
  * Best-effort by design: a teardown helper must never turn a
  * completed measurement into a failed run.
  */
object StreamingShutdown {
  def closeStateStores(): Unit =
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val mod = cls.getField("MODULE$").get(null)
      cls.getMethod("stop").invoke(mod)
    } catch { case _: Throwable => () }
}
