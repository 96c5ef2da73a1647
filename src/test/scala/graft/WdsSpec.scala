package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import graft.kernel.Tar
import graft.operators.WdsShards

/** WebDataset tar shards: the ustar grammar byte-level (hand-laid
  * headers, checksum verification, hostile inputs) and the shard
  * export/import round trip.
  */
class WdsSpec extends SparkSuite {
  import spark.implicits._

  test("tar round-trips members bit-exactly, incl. block-boundary sizes") {
    // 0, 1, 511, 512, 513 bytes — padding boundaries on both sides
    val members = Seq(0, 1, 511, 512, 513).map { n =>
      Tar.Member(s"m$n.bin", Array.tabulate[Byte](n)(i => ((i * 31 + n) & 0xff).toByte))
    }
    val back = Tar.parse(Tar.write(members))
    assert(back.map(_.name) == members.map(_.name))
    back.zip(members).foreach { case (b, m) =>
      assert(java.util.Arrays.equals(b.bytes, m.bytes), m.name)
    }
  }

  test("tar archive layout: 512 blocks, ustar magic, two-block terminator") {
    val bytes = Tar.write(Seq(Tar.Member("a.json", "{}".getBytes(UTF_8))))
    assert(bytes.length % 512 == 0)
    // header + 1 data block + 2 terminator blocks
    assert(bytes.length == 512 * 4)
    assert(new String(bytes, 257, 5, UTF_8) == "ustar")
    assert(bytes(257 + 5) == 0, "POSIX magic is NUL-terminated")
    assert(bytes.slice(bytes.length - 1024, bytes.length).forall(_ == 0))
  }

  test("tar writing is byte-deterministic") {
    val ms = Seq(Tar.Member("1.bin", Array[Byte](1, 2, 3)),
      Tar.Member("2.bin", Array[Byte](4)))
    assert(java.util.Arrays.equals(Tar.write(ms), Tar.write(ms)))
  }

  test("checksum corruption, truncation, bad types all raise loudly") {
    val good = Tar.write(Seq(Tar.Member("x.bin", Array[Byte](1, 2, 3))))
    // flip a payload-adjacent header byte (mode field) → checksum broken
    val corrupt = good.clone(); corrupt(101) = '9'.toByte
    val e1 = intercept[IllegalArgumentException](Tar.parse(corrupt))
    assert(e1.getMessage.contains("checksum"))
    // truncate mid-payload
    val e2 = intercept[IllegalArgumentException](
      Tar.parse(good.take(512 + 1)))
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("past archive end"))
    // directory typeflag ('5') must be rejected, with the checksum fixed
    // so the type check (not the checksum) is what fires
    val dir = good.clone()
    dir(156) = '5'.toByte
    val delta = '5'.toInt - '0'.toInt
    val oldSum = new String(dir, 148, 6, UTF_8)
    val newSum = "%06o".format(Integer.parseInt(oldSum, 8) + delta)
    System.arraycopy(newSum.getBytes(UTF_8), 0, dir, 148, 6)
    val e3 = intercept[IllegalArgumentException](Tar.parse(dir))
    assert(e3.getMessage.contains("unsupported tar member type"))
    // missing end-of-archive terminator: parse must not run off the end
    val e4 = intercept[IllegalArgumentException](Tar.parse(good.take(1024)))
    assert(e4.getMessage.contains("truncated"))
  }

  test("member names over 100 bytes are rejected at write time") {
    val e = intercept[IllegalArgumentException](
      Tar.write(Seq(Tar.Member("x" * 101, Array[Byte](1)))))
    assert(e.getMessage.contains("1..100"))
  }

  test("prefix field resolves long paths on parse") {
    // hand-build a header using the prefix field: prefix "d", name "f"
    val m = Tar.write(Seq(Tar.Member("f.bin", Array[Byte](7))))
    val withPrefix = m.clone()
    withPrefix(345) = 'd'.toByte
    val old = Integer.parseInt(new String(withPrefix, 148, 6, UTF_8), 8)
    System.arraycopy("%06o".format(old + 'd'.toInt).getBytes(UTF_8), 0,
      withPrefix, 148, 6)
    assert(Tar.parse(withPrefix).head.name == "d/f.bin")
  }

  test("shard export/import round-trips rows exactly; assignment is mod-n") {
    val rows = (0L until 37L).map(i =>
      (i, s"""{"k":$i}""", Array.tabulate[Byte]((i % 7).toInt + 1)(j => (i + j).toByte)))
      .toDF("doc_id", "meta", "payload")
    val shards = WdsShards.buildShards(rows, nShards = 5)
    val got = WdsShards.readShards(shards)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq))
      .sortBy(x => (x._2, x._3))
    assert(got.length == 74, "two members per doc")
    got.foreach { case (shard, id, ext, payload) =>
      assert(shard == (id % 5).toInt)
      if (ext == "json") assert(new String(payload.toArray, UTF_8) == s"""{"k":$id}""")
      else assert(payload == Array.tabulate[Byte]((id % 7).toInt + 1)(j => (id + j).toByte).toSeq)
    }
    // within a shard, members are ascending doc_id, json before bin per doc
    val perShard = shards.collect().map(r =>
      (r.getInt(0), Tar.parse(r.getAs[Array[Byte]]("tar")).map(_.name)))
    perShard.foreach { case (shard, names) =>
      val ids = names.grouped(2).map { case Seq(j, b) =>
        assert(j.endsWith(".json") && b.endsWith(".bin"), s"$j/$b")
        assert(j.stripSuffix(".json") == b.stripSuffix(".bin"))
        j.stripSuffix(".json").toLong
      }.toSeq
      assert(ids == ids.sorted, s"shard $shard not ascending: $ids")
      ids.foreach(id => assert(id % 5 == shard))
    }
  }

  test("shard bytes are deterministic across rebuilds") {
    val rows = (0L until 11L).map(i => (i, s"m$i", Array[Byte](i.toByte)))
      .toDF("doc_id", "meta", "payload")
    def build() = WdsShards.buildShards(rows, 3).collect()
      .map(r => (r.getString(1), r.getAs[Array[Byte]]("tar").toSeq)).sortBy(_._1)
    assert(build().toSeq == build().toSeq)
  }

  test("file write + mount: the on-disk layout reads back identically") {
    val dir = tempDir("wds").getAbsolutePath
    val rows = (0L until 13L).map(i => (i, s"""{"i":$i}""", s"payload$i".getBytes(UTF_8)))
      .toDF("doc_id", "meta", "payload")
    val shards = WdsShards.buildShards(rows, 4)
    WdsShards.writeShardFiles(shards, dir)
    // Hadoop's checksummed local FS adds .crc sidecars — loaders (and
    // readShardFiles) glob *.tar, so the listing assertion does too
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tar")).sorted
    assert(files.toSeq == Seq("shard-00000.tar", "shard-00001.tar",
      "shard-00002.tar", "shard-00003.tar"))
    val mounted = WdsShards.readShardFiles(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), UTF_8)))
      .sortBy(x => (x._2, x._3))
    val direct = WdsShards.readShards(shards)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), UTF_8)))
      .sortBy(x => (x._2, x._3))
    assert(mounted.toSeq == direct.toSeq)
    assert(mounted.length == 26)
  }
}
