package graft

import graft.index.LogCloudIndex
import org.scalatest.funsuite.AnyFunSuite

class LogCloudSpec extends AnyFunSuite {

  test("type bitmask ports the reference classification") {
    // reference: src/lava/logcloud/logcloud_common.rs:9-24
    assert(LogCloudIndex.typeBits("123") == 1)
    assert(LogCloudIndex.typeBits("abc") == 2)
    assert(LogCloudIndex.typeBits("ABC") == 4)
    assert(LogCloudIndex.typeBits("XYZ") == 8)
    assert(LogCloudIndex.typeBits("xyz") == 16)
    assert(LogCloudIndex.typeBits("!?") == 32)
    assert(LogCloudIndex.typeBits("deadbeef42") == 3)
    assert(LogCloudIndex.typeBits("{\"k\":87}") == (1 | 16 | 32))
  }

  test("variable queries contain digits and no whitespace") {
    assert(LogCloudIndex.isVariableQuery("87"))
    assert(LogCloudIndex.isVariableQuery("piece219"))
    assert(!LogCloudIndex.isVariableQuery("error"))
    assert(!LogCloudIndex.isVariableQuery("k 87"))
    assert(!LogCloudIndex.isVariableQuery(""))
  }

  test("query type bits are always a subset of a containing value's") {
    val rnd = new scala.util.Random(11)
    def str() = Seq.fill(rnd.nextInt(10))((33 + rnd.nextInt(94)).toChar).mkString
    for (_ <- 0 until 200) {
      val (pre, q, post) = (str(), str(), str())
      val qt = LogCloudIndex.typeBits(q)
      val vt = LogCloudIndex.typeBits(pre + q + post)
      assert((vt & qt) == qt) // the partition-pruning invariant
    }
  }
}
