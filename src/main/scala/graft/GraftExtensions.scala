package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineLshBucket, Md5MinhashPerms, Md5MinhashSig, Md5Simhash, PiiScrub, ShingleHashes, TokenProfileCounts, VecDot, WinnowFingerprints, WordNgrams}

/** SQL surface for the native expressions: register with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) and the sketch/vector
  * primitives become plain SQL functions —
  *
  * {{{
  *   SELECT graft_vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT explode(graft_shingle_hashes(text, 3)) FROM documents
  *   SELECT graft_winnow_fingerprints(text, 8, 4) FROM documents
  *   SELECT graft_cosine_lsh_bucket(embedding, 8) FROM embeddings
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleHashes(text, 3)
        case Seq(text, n) => ShingleHashes(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException(
          "graft_shingle_hashes(text[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WinnowFingerprints(text, 8, 4)
        case Seq(text, k, w) =>
          WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException(
          "graft_winnow_fingerprints(text[, k, w])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WordNgrams(text, 2)
        case Seq(text, n) => WordNgrams(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException(
          "graft_word_ngrams(text[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_perms"),
      new ExpressionInfo(classOf[Md5MinhashPerms].getName, "graft_minhash_perms"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => Md5MinhashPerms(text, 64)
        case Seq(text, k) => Md5MinhashPerms(text, intArg(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_perms(text[, k])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[Md5MinhashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => Md5MinhashSig(text, 3, 64)
        case Seq(text, n, k) =>
          Md5MinhashSig(text, intArg(n, "n"), intArg(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_sig(text[, n, k])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Md5Simhash].getName, "graft_simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => Md5Simhash(text)
        case _ => throw new IllegalArgumentException("graft_simhash(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lang_scores"),
      new ExpressionInfo(classOf[TokenProfileCounts].getName, "graft_lang_scores"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TokenProfileCounts(text,
          graft.functions.TextFuncs.stopwordProfiles.map(_._2))
        case _ => throw new IllegalArgumentException("graft_lang_scores(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pii_scrub"),
      new ExpressionInfo(classOf[PiiScrub].getName, "graft_pii_scrub"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => PiiScrub(text)
        case _ => throw new IllegalArgumentException("graft_pii_scrub(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException("graft_vec_dot(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine_lsh_bucket"),
      new ExpressionInfo(classOf[CosineLshBucket].getName, "graft_cosine_lsh_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(v, bits) => CosineLshBucket(v, intArg(bits, "bits"), 64, 42L)
        case _ => throw new IllegalArgumentException(
          "graft_cosine_lsh_bucket(vec, bits)")
      }))
    // SQL maintenance verbs over DeltaLite/IcebergLite paths — the
    // reference's own idiom (OPTIMIZE / VACUUM / DESCRIBE HISTORY /
    // DESCRIBE DETAIL / RESTORE driven as SQL strings); every other
    // statement delegates to Spark's parser untouched. See GraftSqlVerbs.
    ext.injectParser((session, delegate) =>
      new GraftVerbParser(delegate, Some(session)))
  }
}
