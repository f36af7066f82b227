package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** W7 boundary math (publish.py:1296-1338 parity). */
class ChunkLayoutSpec extends AnyFunSuite {

  test("docstring example: tail 3, chunk 5, append 8 -> (2,5,1)") {
    assert(ChunkLayout.calculateTimeDimChunks(3, 5, 8) == Seq(2, 5, 1))
  }

  test("no existing tail -> plain full+remainder chunking") {
    assert(ChunkLayout.calculateTimeDimChunks(0, 5, 12) == Seq(5, 5, 2))
    assert(ChunkLayout.calculateTimeDimChunks(0, 5, 10) == Seq(5, 5))
  }

  test("append smaller than the gap fits in one chunk") {
    assert(ChunkLayout.calculateTimeDimChunks(3, 5, 1) == Seq(1))
    assert(ChunkLayout.calculateTimeDimChunks(4, 5, 1) == Seq(1))
  }

  test("full tail means first chunk is a fresh one") {
    assert(ChunkLayout.calculateTimeDimChunks(5, 5, 7) == Seq(5, 2))
  }

  test("empty append -> empty run") {
    assert(ChunkLayout.calculateTimeDimChunks(3, 5, 0) == Seq.empty)
  }

  test("offsets accumulate") {
    assert(ChunkLayout.chunkOffsets(Seq(2, 5, 1)) == Seq(2, 7, 8))
  }

  test("exhaustive sweep: entries sum to append length, none bridge chunks") {
    for {
      chunk <- 1 to 12
      tail <- 0 to chunk
      len <- 0 to 60
    } {
      val out = ChunkLayout.calculateTimeDimChunks(tail, chunk, len)
      assert(out.sum == len, s"sum for ($tail,$chunk,$len)")
      assert(out.forall(c => c > 0 && c <= chunk), s"range for ($tail,$chunk,$len)")
      // every chunk except the first and last is full
      if (out.length > 2)
        assert(out.slice(1, out.length - 1).forall(_ == chunk),
          s"interior for ($tail,$chunk,$len)")
      // the first chunk never bridges: tail + first lands on a chunk
      // boundary (incl. the tail-already-full case) or the append ends
      // inside the first chunk
      out.headOption.foreach { first =>
        assert((tail + first) % chunk == 0 || out.length == 1,
          s"bridge for ($tail,$chunk,$len)")
      }
    }
  }
}
