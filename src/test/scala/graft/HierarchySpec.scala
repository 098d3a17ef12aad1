package graft

import graft.operators.Hierarchy

class HierarchySpec extends SparkSuite {
  import spark.implicits._

  test("closure of a chain yields every (descendant, ancestor, depth) pair") {
    // 5 -> 4 -> 3 -> 2 -> 1
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("c", "p")
    val cl = Hierarchy.closure(edges, "c", "p")
    val got = cl.as[(Long, Long, Int)].collect().toSet
    cl.unpersist()
    val expected = (for {
      child <- 2 to 5; anc <- 1 until child
    } yield (child.toLong, anc.toLong, child - anc)).toSet
    assert(got === expected)
  }

  test("closure converges on cycles instead of looping") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("c", "p")
    val cl = Hierarchy.closure(edges, "c", "p", maxDepth = 32)
    val got = cl.as[(Long, Long, Int)].collect().toSet
    cl.unpersist()
    // reachability semantics: each node reaches the other (depth 1) and
    // itself around the cycle (depth 2); fixpoint, no infinite loop
    assert(got === Set((1L, 2L, 1), (2L, 1L, 1), (1L, 1L, 2), (2L, 2L, 2)))
  }

  test("a chain deeper than maxDepth throws instead of shipping a partial closure") {
    // depth-9 chain: closure needs reach ≥ 9, maxDepth = 4 truncates
    val edges = (1L until 10L).map(i => (i + 1, i)).toDF("c", "p")
    val e = intercept[IllegalStateException] {
      Hierarchy.closure(edges, "c", "p", maxDepth = 4).count()
    }
    assert(e.getMessage.contains("did not converge"))
    // the same chain closes fine once the bound covers it — and a bound
    // the fixpoint lands EXACTLY on does not spuriously throw
    val full = Hierarchy.closure(edges, "c", "p", maxDepth = 16)
    assert(full.count() === (9L * 10L) / 2)
    full.unpersist()
  }

  test("closureKnownDepth equals the fixpoint closure when the pin covers the tree") {
    val edges = (1L until 10L).map(i => (i + 1, i)).toDF("c", "p")
    val full = Hierarchy.closure(edges, "c", "p")
    val want = full.as[(Long, Long, Int)].collect().toSet
    full.unpersist()
    // exact pin, and a generous pin — both must land on the same closure
    for (d <- Seq(9, 16)) {
      val got = Hierarchy.closureKnownDepth(edges, "c", "p", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want, s"knownDepth=$d")
    }
    // the pin is a CONTRACT: an under-pin truncates (documented), so
    // callers must pin from schema/construction knowledge
    val short = Hierarchy.closureKnownDepth(edges, "c", "p", 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(short === want.filter(_._3 <= 4))
    assert(short !== want)
  }

  test("closureKnownDepth verify mode: covering pin passes, under-pin throws") {
    val edges = (1L until 10L).map(i => (i + 1, i)).toDF("c", "p")
    // pin covers the depth-9 chain: verify is silent and the result is full
    val ok = Hierarchy.closureKnownDepth(edges, "c", "p", 9, verify = true)
    assert(ok.count() === (9L * 10L) / 2)
    // under-pin: verify round finds the missed longer paths and throws
    val e = intercept[IllegalStateException] {
      Hierarchy.closureKnownDepth(edges, "c", "p", 4, verify = true).count()
    }
    assert(e.getMessage.contains("exceeds the pin"))
  }

  test("subtreeAgg with a pinned depth matches the fixpoint rollup") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("c", "p")
    val nodes = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
    val got = Hierarchy.subtreeAgg(nodes, edges, "id", "v", "c", "p",
        knownDepth = Some(2))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 100.0, 2L -> 60.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("subtreeAgg sums every node's full subtree including itself") {
    //      1
    //    2   3
    //  4
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("c", "p")
    val nodes = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
    val out = Hierarchy.subtreeAgg(nodes, edges, "id", "v", "c", "p")
    val got = out.as[(Long, Double)].collect().toMap
    out.unpersist()
    assert(got === Map(1L -> 100.0, 2L -> 60.0, 3L -> 30.0, 4L -> 40.0))
  }
}
