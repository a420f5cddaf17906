package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Production-parameter evidence for the BPE trainer (SCALE.md): the
  * incremental merge loop is spec-pinned at 2048 merges; this measures it
  * at a production 32k-merge budget, two ways:
  *
  *  1. the REAL corpus end-to-end (distributed word count + driver loop).
  *     The test corpus has a ~31-word vocabulary, so merges exhaust after
  *     every pair has been merged — recorded as-is (merges_learned says
  *     how far it got);
  *  2. a production-SHAPE vocab: 50k distinct synthetic words with Zipf
  *     counts, driver loop only — this is the regime the incremental
  *     bookkeeping exists for (a full per-round recount would be
  *     O(merges x vocab x wordLen) ~ 10^11 driver steps; the incremental
  *     loop touches only affected words).
  *
  *   sbt "runMain graft.tools.BpeScale /root/testdata/sf0.1 32768"
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(32768)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm up

    val t0 = System.nanoTime()
    val corpusModel = Bpe.train(docs, "text", merges)
    val corpusSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"op":"bpe_train_corpus","dir":"$dir","merges_requested":$merges,"merges_learned":${corpusModel.merges.length},"sec":$corpusSec}""")

    // 50k distinct words, 3-12 lowercase chars, Zipf-ish counts — the
    // word-frequency table a web-scale corpus would feed the driver loop
    val rng = new scala.util.Random(7)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < 50000) {
      val len = 3 + rng.nextInt(10)
      seen += Array.fill(len)(('a' + rng.nextInt(26)).toChar).mkString
    }
    val words = seen.iterator.zipWithIndex.map { case (w, i) =>
      (w.map(_.toString).toArray :+ Bpe.EndOfWord,
        math.max(1L, (1e7 / (i + 1)).toLong))
    }.toArray
    val t1 = System.nanoTime()
    val learned = Bpe.learnMerges(words, merges)
    val synthSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"op":"bpe_learn_synth50k","merges_requested":$merges,"merges_learned":${learned.length},"sec":$synthSec}""")
    spark.stop()
  }
}
