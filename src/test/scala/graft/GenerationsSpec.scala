package graft

import org.apache.hadoop.fs.Path

import graft.ops.Generations

/** The generation-pointer protocol's primitive contracts, pinned at the
  * filesystem level (MinhashCompactSpec/SimilaritySpec cover the
  * integrated swap; this suite pins each primitive so a future change
  * to one cannot hide behind the integration tests' coarser
  * assertions): resolution ignores everything but the max COMMITTED
  * generation, begin never touches the live one, sweep retires exactly
  * the non-live ones, commit is one-shot, the producer lock excludes
  * atomically on local roots and refuses object-store roots. */
class GenerationsSpec extends SparkTestBase {

  private def freshRoot(): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gens").toString
    val root = new Path(s"$dir/idx")
    (root.getFileSystem(new org.apache.hadoop.conf.Configuration()), root)
  }

  test("fresh root: no generation resolves; currentDir fails fast; begin opens gen-1") {
    val (fs, root) = freshRoot()
    assert(Generations.resolve(fs, root).isEmpty)
    intercept[IllegalArgumentException](Generations.currentDir(fs, root))
    assert(Generations.begin(fs, root).getName == "gen-1")
  }

  test("resolution is the max COMMITTED generation; uncommitted and foreign dirs never win") {
    val (fs, root) = freshRoot()
    val g1 = Generations.begin(fs, root)
    fs.mkdirs(g1)
    Generations.commit(fs, g1)
    assert(Generations.resolve(fs, root).map(_._1).contains(1))
    // an uncommitted higher generation (crashed rebuild) must not win
    fs.mkdirs(new Path(root, "gen-5"))
    assert(Generations.currentDir(fs, root).getName == "gen-1")
    // nor do non-generation entries disturb resolution
    fs.mkdirs(new Path(root, "streamedish"))
    fs.create(new Path(root, "gen-weird"), true).close()
    assert(Generations.currentDir(fs, root).getName == "gen-1")
    // a committed higher generation DOES win, numerically (gen-10 > gen-9)
    Seq(9, 10).foreach { n =>
      val g = new Path(root, s"gen-$n"); fs.mkdirs(g); Generations.commit(fs, g)
    }
    assert(Generations.currentDir(fs, root).getName == "gen-10")
  }

  test("begin is current+1, removes a crashed uncommitted predecessor, never touches the live gen") {
    val (fs, root) = freshRoot()
    val g1 = Generations.begin(fs, root)
    fs.mkdirs(new Path(g1, "data"))
    Generations.commit(fs, g1)
    // a crashed prior attempt at gen-2 with leftover junk
    fs.mkdirs(new Path(root, "gen-2/junk"))
    val g2 = Generations.begin(fs, root)
    assert(g2.getName == "gen-2")
    assert(!fs.exists(new Path(root, "gen-2/junk")), "begin must clear the crashed attempt")
    assert(fs.exists(new Path(g1, "data")), "begin must never touch the live generation")
  }

  test("sweep retires exactly the non-live generations and is a no-op on a fresh root") {
    val (fs, root) = freshRoot()
    Generations.sweep(fs, root) // nothing to do, nothing thrown
    Seq(1, 2).foreach { n =>
      val g = new Path(root, s"gen-$n"); fs.mkdirs(g); Generations.commit(fs, g)
    }
    fs.mkdirs(new Path(root, "gen-7")) // uncommitted partial
    Generations.sweep(fs, root)
    assert(!fs.exists(new Path(root, "gen-1")), "the old committed generation retires")
    assert(!fs.exists(new Path(root, "gen-7")), "the partial retires")
    assert(Generations.currentDir(fs, root).getName == "gen-2", "the live generation survives")
  }

  test("sweepPartials retires only done-less dirs — committed grace copies survive") {
    val (fs, root) = freshRoot()
    Seq(1, 2).foreach { n =>
      val g = new Path(root, s"gen-$n"); fs.mkdirs(g); Generations.commit(fs, g)
    }
    fs.mkdirs(new Path(root, "gen-3/partial"))
    Generations.sweepPartials(fs, root)
    assert(!fs.exists(new Path(root, "gen-3")), "the crashed partial retires")
    assert(fs.exists(new Path(root, "gen-1")),
      "the committed grace generation must survive a partials-only sweep")
    assert(Generations.currentDir(fs, root).getName == "gen-2")
  }

  test("commit is one-shot (a double flip of the same generation throws, never corrupts)") {
    val (fs, root) = freshRoot()
    val g1 = Generations.begin(fs, root)
    fs.mkdirs(g1)
    Generations.commit(fs, g1)
    intercept[java.io.IOException](Generations.commit(fs, g1))
    assert(Generations.currentDir(fs, root).getName == "gen-1")
  }

  test("producer lock: held fails fast naming the holder and the heal path; release is token-owned and idempotent") {
    val (fs, root) = freshRoot()
    val t1 = Generations.acquireLock(fs, root, "first-producer")
    val e = intercept[IllegalStateException](
      Generations.acquireLock(fs, root, "second-producer"))
    assert(e.getMessage.contains("_GEN_LOCK"), e.getMessage)
    assert(e.getMessage.contains("first-producer"), "the holder tag must surface")
    assert(e.getMessage.contains("delete"), "the stale-lock heal path must surface")
    // a stale token (an earlier bracket's delayed belt-and-braces
    // release) must NOT free a lock a different producer now holds
    Generations.releaseLock(fs, root, "first-producer@not-the-token")
    assert(fs.exists(Generations.lockPath(root)),
      "release with a foreign token must leave the lock in place")
    Generations.releaseLock(fs, root, t1)
    Generations.releaseLock(fs, root, t1) // idempotent — double-release paths are safe
    val t3 = Generations.acquireLock(fs, root, "third-producer") // free again
    Generations.releaseLock(fs, root, t3)
    // an UNREADABLE lock (here: the path is a directory, so open fails)
    // must throw loudly, not silently skip — a silent skip would wedge
    // the root stale with no error anywhere — and must not delete what
    // it cannot verify ownership of
    fs.mkdirs(Generations.lockPath(root))
    intercept[IllegalStateException](Generations.releaseLock(fs, root, t3))
    assert(fs.exists(Generations.lockPath(root)),
      "an unverifiable lock must be left in place")
    fs.delete(Generations.lockPath(root), true)
  }

  test("rebuild serializes producers and releases the lock on success AND on body failure") {
    val (fs, root) = freshRoot()
    // a held lock makes a rebuild fail fast BEFORE any destructive step
    fs.mkdirs(new Path(root, "gen-3")) // a partial a sweeping rebuild would retire
    val t = Generations.acquireLock(fs, root, "concurrent-producer")
    intercept[IllegalStateException](Generations.rebuild(fs, root)(_ => ()))
    assert(fs.exists(new Path(root, "gen-3")),
      "a lock-refused rebuild must not have swept anything")
    Generations.releaseLock(fs, root, t)
    // success path releases: a second rebuild right after must not wedge
    Generations.rebuild(fs, root)(gen => fs.mkdirs(new Path(gen)))
    Generations.rebuild(fs, root)(gen => fs.mkdirs(new Path(gen)))
    assert(Generations.currentDir(fs, root).getName == "gen-2")
    // failure path releases too (the partial is sweepPartials' job; a
    // lock held past the failure would only wedge the retry)
    intercept[RuntimeException](
      Generations.rebuild(fs, root)(_ => throw new RuntimeException("body died")))
    assert(!fs.exists(Generations.lockPath(root)),
      "a failed rebuild must release the producer lock")
    Generations.rebuild(fs, root)(gen => fs.mkdirs(new Path(gen))) // retry proceeds
  }

  test("the lock file never disturbs resolution or survives as a generation") {
    val (fs, root) = freshRoot()
    Generations.rebuild(fs, root)(gen => fs.mkdirs(new Path(gen)))
    val t = Generations.acquireLock(fs, root, "reader-safety-check")
    // readers never take the lock: resolution works while it is held
    assert(Generations.currentDir(fs, root).getName == "gen-1")
    Generations.releaseLock(fs, root, t)
  }

  test("producer lock refuses object-store roots without the external-serialization opt-in") {
    // RawLocalFileSystem masquerading as S3A: the guard is a SCHEME
    // check (on fs.getUri — fs.getScheme's base implementation throws),
    // so a fake URI over a real local store exercises exactly the
    // decision without needing a real object store offline
    val fake = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("s3a:///")
    }
    fake.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val dir = java.nio.file.Files.createTempDirectory("graft-s3ish").toString
    val root = new Path(s"$dir/idx")
    val e = intercept[IllegalStateException](Generations.acquireLock(fake, root, "spec"))
    assert(e.getMessage.contains(Generations.AllowNonAtomicFsProp), e.getMessage)
    assert(e.getMessage.contains("mutual exclusion"), "the refusal must say WHY")
    assert(!fake.exists(Generations.lockPath(root)),
      "a refused acquire must leave nothing on disk")
    // the opt-in states producers are serialized externally — then the
    // lock is best-effort and acquisition proceeds
    System.setProperty(Generations.AllowNonAtomicFsProp, "true")
    try {
      val t = Generations.acquireLock(fake, root, "spec")
      Generations.releaseLock(fake, root, t)
    } finally System.clearProperty(Generations.AllowNonAtomicFsProp)
  }

  test("per-root marker waives the scheme guard for THAT root only") {
    // the JVM property is blunt (one serialized S3 root would waive
    // every root in the JVM); the marker is scoped to the data whose
    // guarantee it waives — a sibling root under the same fake object
    // store must stay refused
    val fake = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("s3a:///")
    }
    fake.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val dir = java.nio.file.Files.createTempDirectory("graft-s3ish-marker").toString
    val optedIn = new Path(s"$dir/idx_serialized")
    val sibling = new Path(s"$dir/idx_unserialized")
    fake.mkdirs(optedIn)
    fake.create(new Path(optedIn, Generations.AllowNonAtomicFsMarker), false).close()
    val t = Generations.acquireLock(fake, optedIn, "spec")
    Generations.releaseLock(fake, optedIn, t)
    val e = intercept[IllegalStateException](
      Generations.acquireLock(fake, sibling, "spec"))
    assert(e.getMessage.contains(Generations.AllowNonAtomicFsMarker),
      "the refusal must name the per-root opt-in")
  }

  test("link-protocol acquire: no temp husk left behind, held and re-acquire unaffected") {
    // r18: local acquires go temp-create → stat → hard-LINK to the lock
    // name, so the inode identity is captured BEFORE the lock name
    // exists (the r17 create-to-stat window is closed, not documented).
    // Externally observable surface: the lock works exactly as before
    // and the protocol's temp name never survives an acquire, a
    // contended acquire, or a release.
    val (fs, root) = freshRoot()
    def husks(): Seq[String] =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).map(_.getPath.getName).toSeq
        .filter(n => n.startsWith("_GEN_LOCK.") && n.endsWith(".tmp"))
    val t1 = Generations.acquireLock(fs, root, "linker")
    assert(husks().isEmpty, s"acquire must unlink its temp name: ${husks()}")
    intercept[IllegalStateException](Generations.acquireLock(fs, root, "contender"))
    assert(husks().isEmpty, s"a refused contender must clean its temp: ${husks()}")
    Generations.releaseLock(fs, root, t1)
    assert(!fs.exists(Generations.lockPath(root)))
    val t2 = Generations.acquireLock(fs, root, "again")
    assert(husks().isEmpty)
    // the token write landed at the LOCK path through the temp-opened
    // handle (same inode): the holder must be readable there
    val e = intercept[IllegalStateException](
      Generations.acquireLock(fs, root, "reader"))
    assert(e.getMessage.contains("again"), "holder token must be visible at the lock path")
    Generations.releaseLock(fs, root, t2)
  }

  test("local-root lock acquisition is atomic under a same-instant race: exactly one winner") {
    // Hadoop's RawLocalFileSystem create(p, overwrite=false) is an
    // exists() check FOLLOWED by a create — two racing producers could
    // both pass it. acquireLock routes file:// through kernel
    // O_CREAT|O_EXCL instead; this race pins that exactly one of N
    // simultaneous acquirers wins (flaky-only under the old TOCTOU,
    // deterministic now).
    val (fs, root) = freshRoot()
    fs.mkdirs(root)
    val n = 16
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] = {
            gate.await()
            try Some(Generations.acquireLock(fs, root, s"racer-$i"))
            catch { case _: IllegalStateException => None }
          }
        })
      }
      gate.countDown()
      val tokens = futures.flatMap(_.get())
      assert(tokens.size == 1, s"exactly one racer may hold the lock, got ${tokens.size}")
      Generations.releaseLock(fs, root, tokens.head)
    } finally pool.shutdown()
  }

  test("a reader that outlives the compaction cycle fails loudly after the next sweep") {
    // the documented bound (module scaladoc): a probe may span ONE flip —
    // the grace generation keeps its files — but not a whole cycle. A
    // DataFrame still resolved over the retired generation when the NEXT
    // rebuild's sweep deletes it must fail its next action LOUDLY
    // (plans record paths, not contents), never return partial rows.
    import spark.implicits._
    val (fs, root) = freshRoot()
    def writeGen(rows: Range): Unit = Generations.rebuild(fs, root) { gen =>
      rows.map(i => (i.toLong, s"row-$i")).toDF("id", "payload").write.parquet(gen)
    }
    writeGen(0 until 10)
    val pinned = spark.read.parquet(Generations.currentDir(fs, root).toString)
    assert(pinned.count() == 10)
    writeGen(0 until 20) // flip: gen-1 is now the grace copy — reader unharmed
    assert(pinned.count() == 10, "the grace generation must keep a spanning reader alive")
    writeGen(0 until 30) // next cycle: sweep retires gen-1 under the reader
    val e = intercept[Exception](pinned.count())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.isInstanceOf[java.io.FileNotFoundException]
        || String.valueOf(t.getMessage).contains("does not exist")),
      s"expected a loud missing-file failure, got: $e")
  }

  test("rebuild = sweep + begin + body + commit, in that order") {
    val (fs, root) = freshRoot()
    val g1 = Generations.begin(fs, root)
    fs.mkdirs(new Path(g1, "old"))
    Generations.commit(fs, g1)
    fs.mkdirs(new Path(root, "gen-9")) // stale partial for the sweep
    Generations.rebuild(fs, root) { gen =>
      // the old generation must still be readable while the body runs
      assert(fs.exists(new Path(g1, "old")), "grace copy must survive until the NEXT sweep")
      assert(!fs.exists(new Path(root, "gen-9")), "sweep precedes begin")
      fs.mkdirs(new Path(gen, "new"))
    }
    assert(Generations.currentDir(fs, root).getName == "gen-2")
    assert(fs.exists(new Path(g1, "old")), "rebuild itself never deletes the predecessor")
  }
}
