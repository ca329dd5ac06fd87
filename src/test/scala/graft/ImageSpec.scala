package graft

import org.apache.spark.sql.functions._
import graft.images.{ImageChecks, SyntheticImages}

/** Image payload validation: decode round-trips, PSNR≥40dB invariant for
  * lossy formats, caption equality, and violation detection over the
  * deterministic synthetic table (BASELINE.json input_hint invariants). */
class ImageSpec extends SparkSpec {

  test("PNG round-trip decodes losslessly with matching dims and format") {
    val img = SyntheticImages.renderPattern(3L, 40, 32)
    val bytes = SyntheticImages.encode(img, "png")
    val d = ImageChecks.decode(bytes)
    assert(d.ok && d.w == 40 && d.h == 32 && d.fmt == "png")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(SyntheticImages.psnr(img, back).isPosInfinity) // lossless
  }

  test("JPEG round-trip satisfies the PSNR >= 40 dB invariant") {
    for (id <- Seq(0L, 11L, 42L, 123L)) {
      val img = SyntheticImages.renderPattern(id, 48, 32)
      val bytes = SyntheticImages.encode(img, "jpeg")
      val d = ImageChecks.decode(bytes)
      assert(d.ok && d.w == 48 && d.h == 32 && d.fmt == "jpeg")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val p = SyntheticImages.psnr(img, back)
      assert(p >= 40.0, s"PSNR $p < 40 for id $id")
    }
  }

  test("truncated/garbage bytes fail decode, not crash") {
    assert(!ImageChecks.decode(Array[Byte](1, 2, 3)).ok)
    assert(!ImageChecks.decode(Array.empty[Byte]).ok)
    assert(!ImageChecks.decode(null).ok)
    val good = SyntheticImages.encode(SyntheticImages.renderPattern(1L, 24, 24), "png")
    assert(!ImageChecks.decode(good.take(good.length / 4)).ok)
  }

  test("phash is deterministic and identical images collide") {
    val a = SyntheticImages.averageHash(SyntheticImages.renderPattern(5L, 32, 32))
    val b = SyntheticImages.averageHash(SyntheticImages.renderPattern(5L, 32, 32))
    val c = SyntheticImages.averageHash(SyntheticImages.renderPattern(6L, 32, 32))
    assert(a == b)
    assert(a != c) // different pattern, different hash (for these ids)
  }

  test("generation is deterministic across calls and parallelism levels") {
    val d1 = SyntheticImages.generateWithId(spark, 200, parallelism = 2).collect().sortBy(_.getLong(0))
    val d2 = SyntheticImages.generateWithId(spark, 200, parallelism = 7).collect().sortBy(_.getLong(0))
    assert(d1.length == 200 && d2.length == 200)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.getString(1) == b.getString(1))
      assert(java.util.Arrays.equals(a.getAs[Array[Byte]](2), b.getAs[Array[Byte]](2)))
      assert(a.getLong(7) == b.getLong(7))
    }
  }

  test("image validation catches every injected violation class, and only those") {
    val n = 1500L
    val imgs = SyntheticImages.generateWithId(spark, n)
    val v = ImageChecks
      .violations(imgs, col("row_id"))
      .collect()
      .map(r => (r.getLong(1), r.getString(0)))
      .toSet

    // expected violations derived from the generator's injection rules
    val expected = scala.collection.mutable.Set[(Long, String)]()
    for (id <- 0L until n if id % 100 == 7) {
      val rid = id + 1
      (id / 100 % 7) match {
        case 0 => expected += ((rid, "type-or-format-error")) // wrong w
        case 1 => expected += ((rid, "type-or-format-error")) // wrong h
        case 2 => expected += ((rid, "type-or-format-error")) // wrong fmt label
        case 3 => expected += ((rid, "missing-geometry"))     // truncated bytes
        case 4 => expected += ((rid, "required-constraint"))  // empty caption
        case 5 => expected += ((rid, "custom-constraint"))    // mutated caption
        case _ =>                                             // duplicate id: caption no longer matches the borrowed id
          val borrowed = math.max(id - 100, 0)
          if (SyntheticImages.caption(borrowed) != SyntheticImages.caption(id))
            expected += ((rid, "custom-constraint"))
      }
    }
    assert(v == expected.toSet)
  }

  test("captionViolations (no-decode path) equals the caption subset of full violations") {
    val n = 1500L
    val imgs = SyntheticImages.generateWithId(spark, n)
    val full = ImageChecks
      .violations(imgs, col("row_id"))
      .filter(col("code").isin("required-constraint", "custom-constraint"))
      .select("code", "row_number", "column_number", "message")
      .collect().map(_.toString).sorted.toSeq
    val captionOnly = ImageChecks
      .captionViolations(imgs.drop("bytes"), col("row_id")) // bytes not even present
      .collect().map(_.toString).sorted.toSeq
    assert(captionOnly == full && captionOnly.nonEmpty)
  }

  test("uniqueness over image_id flags the injected duplicate ids") {
    import graft.runner.{ValidationConfig, ValidationRunner}
    import graft.schema.{Field, FieldConstraints, TableSchema}
    val n = 1500L
    val imgs = SyntheticImages.generateWithId(spark, n).withColumnRenamed("row_id", "_rid").drop("bytes")
    val schema = TableSchema(Seq(Field("image_id", constraints = FieldConstraints(unique = true))))
    val got = ValidationRunner
      .plan(imgs, schema, ValidationConfig(rowNumberCol = "_rid"))
      .violations
      .collect()
      .map(_.getLong(1))
      .toSet
    val expected = (0L until n)
      .filter(id => id % 100 == 7 && id / 100 % 7 == 6 && id >= 100)
      .map(_ + 1)
      .toSet
    assert(got == expected)
  }
}
