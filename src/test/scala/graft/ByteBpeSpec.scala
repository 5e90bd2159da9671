package graft

import org.apache.spark.sql.functions._
import graft.operators.{BpeModel, ByteBpe}

/** Byte-level BPE: pre-tokenizer scanner vs the regex (branch order is
  * load-bearing), deterministic byte-alphabet training, no-UNK byte
  * fallback, and the native expression vs the HOF replace-chain twin. */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand scanner produces the regex's pre-token spans") {
    // every branch + the tricky cases: double space (ws run, then bare
    // word), trailing space, space before digits/punct, tabs, non-ASCII
    val cases = Seq(
      "the cat", "  a", "a  ", " 42nd!", "x\n\ty", "héllo wörld",
      "a+b=c", "emoji 😀 ok", "", " ", "...", "3.14 said: done")
    val df = cases.toDF("text")
    val viaRegex = df.select(ByteBpe.preTokens($"text")).as[Seq[String]].collect()
    cases.zip(viaRegex).foreach { case (s, toks) =>
      assert(toks.mkString == s, s"regex spans must tile '$s': $toks")
      // scanner twin: the native expr with ZERO merges emits one wrapped
      // hex run per pre-token — decode the boundaries back
      val st = graft.functions.NativeExprs.byteBpeStats(
        lit(s), ByteBpe.Model(Nil))
      val enc = Seq(s).toDF("t").select(st.getField("enc")).as[String].head()
      val scanned =
        if (enc.isEmpty) Seq.empty[String]
        else enc.split("\\|", -1).toSeq.map { w =>
          val hex = w.split(ByteBpe.Sep).filter(_.nonEmpty)
          new String(hex.map(h => Integer.parseInt(h, 16).toByte),
                     java.nio.charset.StandardCharsets.UTF_8)
        }
      assert(scanned == toks.toSeq, s"scanner vs regex on '$s'")
    }
  }

  test("training on the byte alphabet is deterministic and ranked") {
    // "aa"x10, "ab"x5: pair (61,61) wins round 1; round 2 merges (61,62)
    val m = BpeModel.trainSymbols(
      Seq((Array("61", "61"), 10L), (Array("61", "62"), 5L)), numMerges = 8)
    assert(m == Seq(("61", "61"), ("61", "62")))
    // rank order application: merges learned later consume earlier output
    val model = ByteBpe.Model(Seq(("61", "61"), ("6161", "6161")))
    assert(ByteBpe.encodeToken("aaaa", model).toSeq == Seq("61616161"))
    assert(ByteBpe.encodeToken("aaa", model).toSeq == Seq("6161", "61"))
  }

  test("byte fallback: everything tokenizes, no UNK") {
    val model = ByteBpe.Model(Nil)
    // a 4-byte emoji is 4 byte tokens under an empty merge table
    assert(ByteBpe.encodeToken("😀", model).toSeq ==
      Seq("F0", "9F", "98", "80"))
    assert(ByteBpe.encodeWrapped(" a", model) == "·20··61·")
  }

  test("native expression matches the HOF replace-chain on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(150).cache()
    val model = ByteBpe.learn(docs)
    assert(model.merges.nonEmpty)
    val viaChain = ByteBpe.docStatsChain(docs, model)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val st = graft.functions.NativeExprs.byteBpeStats($"text", model)
    val viaNative = docs.select($"doc_id",
        coalesce(st.getField("n_pretokens"), lit(0L)),
        coalesce(st.getField("n_tokens"), lit(0L)),
        md5(coalesce(st.getField("enc"), lit("")).cast("binary")))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(viaNative.keySet == viaChain.keySet)
    viaNative.foreach { case (id, v) =>
      assert(v == viaChain(id), s"native vs chain diverge on doc $id")
    }
    docs.unpersist()
  }

  test("oracle SQL embeds hex merges and rejects non-hex symbols") {
    val sql = ByteBpe.oracleSql(ByteBpe.Model(Seq(("61", "61"))))
    assert(sql.contains("'·61··61·', '·6161·'"))
    assert(sql.contains("regexp_extract_all(text,"))
    intercept[IllegalArgumentException] {
      ByteBpe.oracleSql(ByteBpe.Model(Seq(("6g", "61"))))
    }
  }
}
