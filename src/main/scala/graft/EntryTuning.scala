package graft

/** Process-level tuning for the BENCH/TEST entry points only — never
  * applied by a library class load (a host application embedding the
  * sync module keeps its own JVM-global defaults).
  */
object EntryTuning {

  /** Embedded-Derby stand-in tuning (r13, measured): Derby fsyncs its
    * transaction log on EVERY commit; with the suite's batched MERGE
    * ticks that means thousands of synchronous disk flushes that model
    * nothing about the sync engine under test — against a real
    * networked MS-SQL the flush happens server-side, off the wire
    * latency being measured. `derby.system.durability=test` keeps
    * Derby's transactional semantics inside the JVM (same visibility,
    * same rollback) but skips the fsyncs; only crash-recovery of the
    * embedded db files is forfeited, which no test relies on (crash
    * tests simulate failure with exceptions inside one JVM). Must be
    * called before the Derby engine boots; a pre-set value is
    * respected. JVM-global — which is exactly why it lives here and
    * not in a static initializer of the JdbcSync library module.
    */
  def tuneEmbeddedDerby(): Unit =
    if (System.getProperty("derby.system.durability") == null)
      System.setProperty("derby.system.durability", "test")
}
