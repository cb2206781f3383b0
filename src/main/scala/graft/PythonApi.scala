package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Java-friendly facade over the pipeline operators for the Python
  * wrapper (`python/graft_pipeline.py`): string column names instead of
  * `Column`s, `java.util.List` instead of Scala collections, no default
  * arguments (py4j sees plain JVM methods). Each method is a thin
  * delegation — all semantics, scaladoc and scale notes live on the
  * underlying operators.
  *
  * (The index API needs no such facade: its builder chain is already
  * string-based — see `python/graft_index.py`.)
  */
object PythonApi {

  // ---- dedup ----------------------------------------------------------

  def dedupExact(df: DataFrame, keyCol: String, tieBreakCol: String): DataFrame =
    graft.dedup.Dedup.dedupExact(df, col(keyCol), col(tieBreakCol))

  def dedupMinhash(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleK: Int, threshold: Double): DataFrame =
    graft.dedup.Dedup.dedupMinhash(df, col(idCol), col(textCol),
      numHashes, bands, shingleK, threshold)

  def buildMinhashIndex(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      numHashes: Int, bands: Int, shingleK: Int): Unit =
    graft.dedup.Dedup.buildMinhashIndex(df, col(idCol), col(textCol), dir,
      numHashes, bands, shingleK)

  def appendToMinhashIndex(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      numHashes: Int, bands: Int, shingleK: Int): Unit =
    graft.dedup.Dedup.appendToMinhashIndex(df, col(idCol), col(textCol), dir,
      numHashes, bands, shingleK)

  def appendMinhashSegment(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      segmentId: String, numHashes: Int, bands: Int, shingleK: Int): Unit =
    graft.dedup.Dedup.appendMinhashSegment(df, col(idCol), col(textCol), dir,
      segmentId, numHashes, bands, shingleK)

  def compactMinhashSegments(
      spark: SparkSession, dir: String,
      numHashes: Int, bands: Int, shingleK: Int): Int =
    graft.dedup.Dedup.compactMinhashSegments(spark, dir,
      numHashes, bands, shingleK)

  def dedupAgainstIndex(
      spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      dir: String, numHashes: Int, bands: Int, shingleK: Int,
      threshold: Double): DataFrame =
    graft.dedup.Dedup.dedupAgainstIndex(spark, df, col(idCol), col(textCol),
      dir, numHashes, bands, shingleK, threshold)

  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame =
    graft.dedup.Dedup.editDistancePairs(df, col(idCol), col(strCol), maxDist)

  def editDistanceLookup(
      queries: DataFrame, qIdCol: String, qCol: String,
      dict: DataFrame, wCol: String, maxDist: Int): DataFrame =
    graft.dedup.Dedup.editDistanceLookup(queries, col(qIdCol), col(qCol),
      dict, col(wCol), maxDist)

  def spellCorrect(
      queries: DataFrame, qIdCol: String, qCol: String,
      dict: DataFrame, wCol: String, maxDist: Int): DataFrame =
    graft.dedup.Dedup.spellCorrect(queries, col(qIdCol), col(qCol),
      dict, col(wCol), maxDist)

  def buildEditDistanceIndex(
      df: DataFrame, idCol: String, strCol: String, dir: String,
      maxDist: Int): Unit =
    graft.dedup.Dedup.buildEditDistanceIndex(df, col(idCol), col(strCol),
      dir, maxDist)

  def appendEditDistanceSegment(
      df: DataFrame, idCol: String, strCol: String, dir: String,
      segmentId: String, maxDist: Int): Unit =
    graft.dedup.Dedup.appendEditDistanceSegment(df, col(idCol), col(strCol),
      dir, segmentId, maxDist)

  def compactEditDistanceSegments(spark: SparkSession, dir: String,
      maxDist: Int): Int =
    graft.dedup.Dedup.compactEditDistanceSegments(spark, dir, maxDist)

  def matchAgainstEditDistanceIndex(
      spark: SparkSession, df: DataFrame, idCol: String, strCol: String,
      dir: String, maxDist: Int): DataFrame =
    graft.dedup.Dedup.matchAgainstEditDistanceIndex(spark, df, col(idCol),
      col(strCol), dir, maxDist)

  def dedupAgainstEditDistanceIndex(
      spark: SparkSession, df: DataFrame, idCol: String, strCol: String,
      dir: String, maxDist: Int): DataFrame =
    graft.dedup.Dedup.dedupAgainstEditDistanceIndex(spark, df, col(idCol),
      col(strCol), dir, maxDist)

  def leakageMatrix(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      k: Int, w: Int, minShared: Long, maxDf: Long): DataFrame =
    graft.ops.Report.leakageMatrix(df, col(idCol), col(textCol),
      col(sourceCol), k, w, minShared, maxDf)

  def blocklistMatches(
      df: DataFrame, idCol: String, textCol: String,
      phrases: java.util.List[String]): DataFrame =
    graft.text.TextFunctions.blocklistMatches(df, col(idCol), col(textCol),
      scala.jdk.CollectionConverters.ListHasAsScala(phrases).asScala.toSeq)

  def filterBlockedPhrases(
      df: DataFrame, textCol: String,
      phrases: java.util.List[String]): DataFrame =
    graft.text.TextFunctions.filterBlockedPhrases(df, col(textCol),
      scala.jdk.CollectionConverters.ListHasAsScala(phrases).asScala.toSeq)

  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame =
    graft.text.TextFunctions.winnowFingerprints(df, col(idCol), col(textCol), k, w)

  def winnowPairs(
      df: DataFrame, idCol: String, textCol: String, k: Int, w: Int,
      minShared: Long, maxDf: Long): DataFrame =
    graft.text.TextFunctions.winnowPairs(df, col(idCol), col(textCol), k, w,
      minShared, maxDf)

  def buildWinnowIndex(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      k: Int, w: Int): Unit =
    graft.text.TextFunctions.buildWinnowIndex(df, col(idCol), col(textCol),
      dir, k, w)

  def appendWinnowSegment(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      segmentId: String, k: Int, w: Int): Unit =
    graft.text.TextFunctions.appendWinnowSegment(df, col(idCol), col(textCol),
      dir, segmentId, k, w)

  def compactWinnowSegments(spark: SparkSession, dir: String,
      k: Int, w: Int): Int =
    graft.text.TextFunctions.compactWinnowSegments(spark, dir, k, w)

  def dedupAgainstWinnowIndex(
      spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int, w: Int, minShared: Long): DataFrame =
    graft.text.TextFunctions.dedupAgainstWinnowIndex(spark, df, col(idCol),
      col(textCol), dir, k, w, minShared)

  // ---- text quality / decontamination ---------------------------------

  /** doc frame + (lang_pred, quality, gopher_pass) appended map-side. */
  def textSignals(df: DataFrame, textCol: String): DataFrame = {
    val t = graft.text.TextFunctions
    df.withColumn("lang_pred", t.langId(col(textCol)))
      .withColumn("quality", t.qualityScore(col(textCol)))
      .withColumn("gopher_pass", t.gopherFlags(col(textCol)).getField("pass"))
  }

  def redactPii(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, graft.text.TextFunctions.redactPii(col(textCol)))

  def decontaminate(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleK: Int, minOverlap: Int): DataFrame =
    graft.text.Decontaminate.decontaminate(
      corpus, col(corpusIdCol), col(corpusTextCol),
      bench, col(benchIdCol), col(benchTextCol), shingleK, minOverlap)

  def decontaminateFuzzy(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      numHashes: Int, bands: Int, shingleK: Int, threshold: Double): DataFrame =
    graft.text.Decontaminate.decontaminateFuzzy(
      corpus, col(corpusIdCol), col(corpusTextCol),
      bench, col(benchIdCol), col(benchTextCol),
      numHashes, bands, shingleK, threshold)

  // ---- materialized search index --------------------------------------

  def buildSearchIndex(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      chunkSize: Int): Unit =
    graft.text.SearchIndex.buildSearchIndex(df, col(idCol), col(textCol),
      dir, chunkSize)

  def appendToSearchIndex(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      chunkSize: Int): Unit =
    graft.text.SearchIndex.appendToSearchIndex(df, col(idCol), col(textCol),
      dir, chunkSize)

  def appendSearchSegment(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      segmentId: String, chunkSize: Int): Unit =
    graft.text.SearchIndex.appendSegment(df, col(idCol), col(textCol),
      dir, segmentId, chunkSize)

  def compactSearchSegments(
      spark: SparkSession, dir: String, chunkSize: Int): Int =
    graft.text.SearchIndex.compactSegments(spark, dir, chunkSize)

  def searchIndexAll(
      spark: SparkSession, dir: String, terms: java.util.List[String],
      chunkSize: Int): DataFrame =
    graft.text.SearchIndex.searchIndexAll(spark, dir, terms.asScala.toSeq,
      chunkSize)

  def bm25Index(
      spark: SparkSession, dir: String, terms: java.util.List[String],
      k1: Double, b: Double, chunkSize: Int): DataFrame =
    graft.text.SearchIndex.bm25Index(spark, dir, terms.asScala.toSeq,
      k1, b, chunkSize)

  // ---- embeddings / ANN -----------------------------------------------

  /** Fit k-means once and return every vector's top-k cosine neighbors
    * (the kNN-graph convenience composition of kmeansFit + knnJoin). */
  def knnJoin(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, kmeansK: Int, iters: Int): DataFrame = {
    val cents = graft.ann.Ann.kmeansFit(
      df, col(idCol), col(vecCol), kmeansK, iters)
    graft.ann.Ann.knnJoin(df, col(idCol), col(vecCol), cents, k, nprobe)
  }

  def buildIvfPqIndex(
      df: DataFrame, idCol: String, vecCol: String, dir: String,
      dim: Int, cells: Int, m: Int, codebookK: Int, seed: Long): Unit =
    graft.ann.Ann.buildIvfPqIndex(df, col(idCol), col(vecCol), dir,
      dim, cells, m, codebookK, seed)

  def appendToIvfPqIndex(
      df: DataFrame, idCol: String, vecCol: String, dir: String,
      dim: Int, cells: Int, m: Int, codebookK: Int, seed: Long): Unit =
    graft.ann.Ann.appendToIvfPqIndex(df, col(idCol), col(vecCol), dir,
      dim, cells, m, codebookK, seed)

  def queryIvfPqIndex(
      spark: SparkSession, dir: String, query: java.util.List[java.lang.Double],
      k: Int, cells: Int, nprobe: Int, m: Int, codebookK: Int,
      seed: Long): DataFrame =
    graft.ann.Ann.queryIvfPqIndex(spark, dir,
      query.asScala.toSeq.map(_.doubleValue()), k, cells, nprobe, m,
      codebookK, seed, excludeId = None)

  // ---- sampling / splits ----------------------------------------------

  def hashSample(
      df: DataFrame, idCol: String, fraction: Double, salt: String): DataFrame =
    graft.ops.Sampling.hashSample(df, col(idCol), fraction, salt)

  def assignSplit(
      df: DataFrame, idCol: String, names: java.util.List[String],
      weights: java.util.List[java.lang.Double], salt: String): DataFrame = {
    require(names.size == weights.size, "names and weights must align")
    val splits = names.asScala.toSeq
      .zip(weights.asScala.toSeq.map(_.doubleValue()))
    graft.ops.Sampling.assignSplit(df, col(idCol), splits, salt)
  }

  // ---- graph ----------------------------------------------------------

  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampPct: Int): DataFrame =
    graft.ops.Graph.pageRank(edges, col(srcCol), col(dstCol), iters, dampPct)

  // ---- trained selection models ---------------------------------------

  def dsirWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    graft.text.Dsir.importanceWeights(raw, target, col(idCol), col(textCol),
      buckets)

  def dsirSelect(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      k: Int, buckets: Int): DataFrame =
    graft.text.Dsir.selectByImportance(raw, target, col(idCol), col(textCol),
      k, buckets)

  def dsirResample(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      k: Int, salt: String, buckets: Int): DataFrame =
    graft.text.Dsir.resampleByImportance(raw, target, col(idCol), col(textCol),
      k, salt, buckets)

  def klDivergence(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    graft.text.Dsir.klDivergence(raw, target, col(idCol), col(textCol), buckets)

  /** Fit + score in one call (py4j needs no model object round-trip):
    * trains on pos/neg, scores `docs`. */
  def logRegScore(
      docs: DataFrame, pos: DataFrame, neg: DataFrame,
      idCol: String, textCol: String,
      buckets: Int, iters: Int, etaMilli: Long): DataFrame = {
    val model = graft.text.LogReg.fit(pos, neg, col(idCol), col(textCol),
      buckets, iters, etaMilli)
    graft.text.LogReg.score(docs, col(idCol), col(textCol), model)
  }

  // ---- containment / projection / URL / keyed-table -------------------

  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, threshold: Double): DataFrame =
    graft.dedup.Dedup.containmentPairs(df, col(idCol), col(textCol),
      shingleK, threshold)

  def decontaminateContainment(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleK: Int, threshold: Double): DataFrame =
    graft.text.Decontaminate.decontaminateContainment(
      corpus, col(corpusIdCol), col(corpusTextCol),
      bench, col(benchIdCol), col(benchTextCol), shingleK, threshold)

  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int, seed: Long): DataFrame =
    graft.ann.Ann.randomProjection(df, col(idCol), col(vecCol), outDim, dim, seed)

  def normalizeUrl(df: DataFrame, urlCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, graft.text.Web.normalizeUrl(col(urlCol)))

  def htmlToText(df: DataFrame, htmlCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, graft.text.Web.htmlToText(col(htmlCol)))

  def htmlBlocks(
      df: DataFrame, idCol: String, htmlCol: String,
      minTokens: Int, maxAnchorPct: Int): DataFrame =
    graft.text.Web.htmlBlocks(df, col(idCol), col(htmlCol), minTokens, maxAnchorPct)

  def topKByGroup(
      df: DataFrame, groupCol: String, keyCol: String, idCol: String,
      k: Int): DataFrame =
    graft.ops.TopK.topKByGroup(df, col(groupCol), col(keyCol), col(idCol), k)

  // ---- index-backed pruning (compose with spark.index loads) ----------

  def topKPruned(
      df: DataFrame, keyCol: String, k: Int, largest: Boolean): DataFrame =
    graft.index.TopK.topKPruned(df, col(keyCol), k, largest)

  def topKPerGroupPruned(
      df: DataFrame, groupCol: String, keyCol: String, k: Int,
      largest: Boolean): DataFrame =
    graft.index.TopK.topKPerGroupPruned(df, col(groupCol), col(keyCol), k, largest)

  def semiJoinPruned(
      fact: DataFrame, dim: DataFrame, factKeyCol: String, dimKeyCol: String,
      maxKeys: Int): DataFrame =
    graft.index.JoinPrune.semiJoinPruned(fact, dim, col(factKeyCol),
      col(dimKeyCol), maxKeys)

  def bloomJoinPruned(
      fact: DataFrame, dim: DataFrame, factKeyCol: String, dimKeyCol: String,
      expectedKeys: Long, fpp: Double): DataFrame =
    graft.index.JoinPrune.bloomJoinPruned(fact, dim, col(factKeyCol),
      col(dimKeyCol), expectedKeys, fpp)

  def kmeansStateInit(
      df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    graft.ann.Ann.kmeansStateInit(df, col(idCol), col(vecCol), k)

  def kmeansStateUpdate(
      state: DataFrame, df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.ann.Ann.kmeansStateUpdate(state, df, col(idCol), col(vecCol))

  def kmeansStateReport(state: DataFrame): DataFrame =
    graft.ann.Ann.kmeansStateReport(state)

  def writeJsonlShards(
      df: DataFrame, shardCol: String, orderCol: String, outDir: String,
      docsPerShard: Int): Long =
    graft.ops.Export.writeJsonlShards(
      df, col(shardCol), col(orderCol), outDir, docsPerShard)

  def readJsonlShards(
      spark: SparkSession, dir: String, ddl: String): DataFrame =
    graft.ops.Export.readJsonlShards(spark, dir, ddl)

  def writeKeyedTable(
      df: DataFrame, keyCol: String, dir: String, numBuckets: Int,
      mode: String): Unit =
    graft.ops.Upsert.writeKeyedTable(df, keyCol, dir, numBuckets, mode)

  def readKeyedTable(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Upsert.readKeyedTable(spark, dir)

  def rebucketKeyedTable(
      spark: SparkSession, dir: String, keyCol: String,
      oldBuckets: Int, newBuckets: Int): Unit =
    graft.ops.Upsert.rebucketKeyedTable(spark, dir, keyCol, oldBuckets, newBuckets)

  /** @return [touchedBuckets, totalBuckets, upserted, carried] */
  def upsertByKey(
      spark: SparkSession, dir: String, updates: DataFrame, keyCol: String,
      numBuckets: Int): java.util.List[Long] = {
    val s = graft.ops.Upsert.upsertByKey(spark, dir, updates, keyCol, numBuckets)
    Seq(s.touchedBuckets.toLong, s.totalBuckets.toLong, s.upserted, s.carried).asJava
  }

  /** @return [touchedBuckets, totalBuckets, deleted, carried] */
  def deleteByKey(
      spark: SparkSession, dir: String, keys: DataFrame, keyCol: String,
      numBuckets: Int): java.util.List[Long] = {
    val s = graft.ops.Upsert.deleteByKey(spark, dir, keys, keyCol, numBuckets)
    Seq(s.touchedBuckets.toLong, s.totalBuckets.toLong, s.deleted, s.carried).asJava
  }

  // ---- SCD Type-2 history ---------------------------------------------

  def scd2FromChangeLog(
      changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: java.util.List[String],
      tieBreakCols: java.util.List[String]): DataFrame =
    graft.ops.Scd2.fromChangeLog(changes, keyCol, tsCol,
      attrCols.asScala.toSeq, tieBreakCols.asScala.toSeq)

  def scd2WriteHistory(
      spark: SparkSession, changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: java.util.List[String], dir: String, numBuckets: Int,
      tieBreakCols: java.util.List[String], mode: String): Unit =
    graft.ops.Scd2.writeHistory(spark, changes, keyCol, tsCol,
      attrCols.asScala.toSeq, dir, numBuckets, tieBreakCols.asScala.toSeq,
      mode)

  def scd2ReadHistory(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Scd2.readHistory(spark, dir)

  /** @return [touchedBuckets, totalBuckets, applied, rewritten] */
  def scd2MergeChanges(
      spark: SparkSession, dir: String, batch: DataFrame, keyCol: String,
      tsCol: String, attrCols: java.util.List[String], numBuckets: Int,
      tieBreakCols: java.util.List[String]): java.util.List[Long] = {
    val s = graft.ops.Scd2.mergeChanges(spark, dir, batch, keyCol, tsCol,
      attrCols.asScala.toSeq, numBuckets, tieBreakCols.asScala.toSeq)
    Seq(s.touchedBuckets.toLong, s.totalBuckets.toLong, s.applied,
      s.rewritten).asJava
  }

  /** `at` is an ISO timestamp/date string, e.g. "2024-01-15 00:00:00". */
  def scd2AsOf(history: DataFrame, at: String): DataFrame =
    graft.ops.Scd2.asOf(history,
      org.apache.spark.sql.functions.lit(at).cast("timestamp"))

  def scd2LookupAsOf(
      facts: DataFrame, factKeyCol: String, factTimeCol: String,
      history: DataFrame, keyCol: String, attrCols: java.util.List[String],
      prefix: String): DataFrame =
    graft.ops.Scd2.lookupAsOf(facts, factKeyCol, factTimeCol, history,
      keyCol, attrCols.asScala.toSeq, prefix)

  // ---- trigram substring index ----------------------------------------

  def trigramAppendSegment(
      docs: DataFrame, idCol: String, textCol: String, dir: String,
      segmentId: String, chunkSize: Int): Unit =
    graft.text.Trigram.appendSegment(docs, col(idCol), col(textCol), dir,
      segmentId, chunkSize)

  def trigramCompactSegments(
      spark: SparkSession, dir: String, chunkSize: Int): Int =
    graft.text.Trigram.compactSegments(spark, dir, chunkSize)

  def trigramSearchSubstring(
      spark: SparkSession, dir: String, corpus: DataFrame, idCol: String,
      textCol: String, pattern: String, chunkSize: Int): DataFrame =
    graft.text.Trigram.searchSubstring(spark, dir, corpus, col(idCol),
      col(textCol), pattern, chunkSize)

  // ---- hybrid retrieval -----------------------------------------------

  def hybridRetrieve(
      docs: DataFrame, idCol: String, textCol: String,
      embeddings: DataFrame, embIdCol: String, vecCol: String,
      terms: java.util.List[String], queryVec: java.util.List[Double],
      nCandidates: Int, k: Int, c: Int): DataFrame =
    graft.text.Hybrid.hybridRetrieve(docs, col(idCol), col(textCol),
      embeddings, col(embIdCol), col(vecCol), terms.asScala.toSeq,
      queryVec.asScala.toSeq.map(_.doubleValue), nCandidates, k, c)

  def rrfFuse(lexical: DataFrame, vector: DataFrame, k: Int, c: Int): DataFrame =
    graft.text.Hybrid.rrfFuse(lexical, vector, k, c)

  // ---- count-min sketch -----------------------------------------------

  def countMinCells(
      items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    graft.ops.Cms.countMinCells(items, col(itemCol), depth, width)

  def cmsMergeCells(a: DataFrame, b: DataFrame): DataFrame =
    graft.ops.Cms.mergeCells(a, b)

  def cmsEstimateCounts(
      cells: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    graft.ops.Cms.estimateCounts(cells, queries, col(itemCol), depth, width)

  def cmsAppendCellsSegment(
      items: DataFrame, itemCol: String, depth: Int, width: Int,
      dir: String, segmentId: String): Unit =
    graft.ops.Cms.appendCellsSegment(items, col(itemCol), depth, width,
      dir, segmentId)

  def cmsReadCells(
      spark: SparkSession, dir: String, depth: Int, width: Int): DataFrame =
    graft.ops.Cms.readCells(spark, dir, depth, width)

  def cmsCompactCellsSegments(
      spark: SparkSession, dir: String, depth: Int, width: Int): Int =
    graft.ops.Cms.compactCellsSegments(spark, dir, depth, width)

  def cmsHeavyHitters(
      items: DataFrame, itemCol: String, depth: Int, width: Int,
      minCount: Long): DataFrame =
    graft.ops.Cms.heavyHitters(items, col(itemCol), depth, width, minCount)

  // ---- contrastive training prep --------------------------------------

  def sampleNegatives(
      positives: DataFrame, qCol: String, posCol: String, corpusSize: Int,
      k: Int, salt: String, oversample: Int): DataFrame =
    graft.ops.Contrastive.sampleNegatives(positives, col(qCol), col(posCol),
      corpusSize, k, salt, oversample)

  def adjacentChunkPairs(
      docs: DataFrame, idCol: String, textCol: String, chunkTokens: Int,
      stride: Int): DataFrame =
    graft.ops.Contrastive.adjacentChunkPairs(docs, col(idCol), col(textCol),
      chunkTokens, stride)

  // ---- temporal -------------------------------------------------------

  def intervalOverlapJoin(
      left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bucketWidth: Long, leftKey: String, rightKey: String): DataFrame =
    graft.ops.Temporal.intervalOverlapJoin(left, lLo, lHi, right, rLo, rHi,
      bucketWidth,
      if (leftKey == null || leftKey.isEmpty) None
      else Some((leftKey, rightKey)))

  // ---- quality signals ------------------------------------------------

  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.text.Tfidf.tokenEntropy(docs, col(idCol), col(textCol))

  /** checks = [name, sqlPredicate, name, sqlPredicate, ...]. */
  def expectCheck(
      df: DataFrame, checks: java.util.List[String]): DataFrame = {
    val pairs = checks.asScala.toSeq.grouped(2).map {
      case Seq(n, p) => n -> org.apache.spark.sql.functions.expr(p)
      case other => throw new IllegalArgumentException(
        s"checks must be (name, predicate) pairs, got: $other")
    }.toSeq
    graft.ops.Expect.check(df, pairs)
  }

  def expectEnforce(
      df: DataFrame, checks: java.util.List[String]): DataFrame = {
    val pairs = checks.asScala.toSeq.grouped(2).map {
      case Seq(n, p) => n -> org.apache.spark.sql.functions.expr(p)
      case other => throw new IllegalArgumentException(
        s"checks must be (name, predicate) pairs, got: $other")
    }.toSeq
    graft.ops.Expect.enforce(df, pairs)
  }

  def zScoreOutliers(
      df: DataFrame, groupCol: String, valueCol: String, z: Int): DataFrame =
    graft.ops.Anomaly.zScoreOutliers(df, col(groupCol), col(valueCol), z)

  // ---- portable HyperLogLog -------------------------------------------

  def hllRegisters(items: DataFrame, itemCol: String, p: Int): DataFrame =
    graft.ops.Hll.hllRegisters(items, col(itemCol), p)

  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    graft.ops.Hll.mergeRegisters(a, b)

  def hllEstimateDistinct(registers: DataFrame, p: Int): Double =
    graft.ops.Hll.estimateDistinct(registers, p)

  def hllApproxDistinct(items: DataFrame, itemCol: String, p: Int): Double =
    graft.ops.Hll.approxDistinct(items, col(itemCol), p)

  def hllApproxDistinctByGroup(
      items: DataFrame, groupCol: String, itemCol: String, p: Int): DataFrame =
    graft.ops.Hll.approxDistinctByGroup(items, col(groupCol), col(itemCol), p)

  // ---- robust ingest --------------------------------------------------

  /** `schemaDdl` is a DDL fragment, e.g. "k INT, name STRING". */
  def parseJsonTagged(
      df: DataFrame, jsonCol: String, schemaDdl: String): DataFrame =
    graft.ops.Ingest.parseJsonTagged(df, col(jsonCol),
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  def parseCsvTagged(
      df: DataFrame, csvCol: String, schemaDdl: String): DataFrame =
    graft.ops.Ingest.parseCsvTagged(df, col(csvCol),
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  /** @return [good, quarantined] */
  def ingestJsonFiles(
      spark: SparkSession, inputGlob: String, schemaDdl: String,
      outDir: String): java.util.List[Long] = {
    val s = graft.ops.Ingest.ingestJsonFiles(spark, inputGlob,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl), outDir)
    Seq(s.good, s.quarantined).asJava
  }

  def readIngested(spark: SparkSession, outDir: String): DataFrame =
    graft.ops.Ingest.readIngested(spark, outDir)

  // ---- sequence packing + schedule ------------------------------------

  def packByBudget(
      df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame =
    graft.ops.Packing.packByBudget(df, col(shardCol), col(orderCol),
      col(tokensCol), budget)

  def packManifest(
      df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame =
    graft.ops.Packing.packManifest(df, col(shardCol), col(orderCol),
      col(tokensCol), budget)

  def packSequences(
      df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, seqLen: Long): DataFrame =
    graft.ops.Packing.packSequences(df, col(shardCol), col(orderCol),
      col(tokensCol), seqLen)

  def materializeSequences(
      df: DataFrame, shardCol: String, orderCol: String,
      tokensArrCol: String, seqLen: Long): DataFrame =
    graft.ops.Packing.materializeSequences(df, col(shardCol), col(orderCol),
      col(tokensArrCol), seqLen)

  def strideSchedule(
      seqs: DataFrame, shardCol: String, seqIdCol: String,
      weights: java.util.Map[String, java.lang.Double]): DataFrame =
    graft.ops.Packing.strideSchedule(seqs, col(shardCol), col(seqIdCol),
      weights.asScala.map { case (k, v) => k -> v.doubleValue }.toMap)

  // ---- event analytics ------------------------------------------------

  def funnel(
      events: DataFrame, userCol: String, tsCol: String, actionCol: String,
      actions: java.util.List[String]): DataFrame =
    graft.ops.Funnel.funnel(events, col(userCol), col(tsCol),
      col(actionCol), actions.asScala.toSeq)

  def funnelCounts(
      events: DataFrame, userCol: String, tsCol: String, actionCol: String,
      actions: java.util.List[String]): DataFrame =
    graft.ops.Funnel.funnelCounts(events, col(userCol), col(tsCol),
      col(actionCol), actions.asScala.toSeq)

  def gapFillCounts(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketSeconds: Long): DataFrame =
    graft.ops.Funnel.gapFillCounts(events, col(keyCol), col(tsCol),
      col(valueCol), bucketSeconds)

  def strideScheduleBy(
      seqs: DataFrame, shardCol: String, seqIdCol: String,
      weights: DataFrame): DataFrame =
    graft.ops.Packing.strideScheduleBy(seqs, col(shardCol), col(seqIdCol),
      weights)

  def retentionCohorts(
      events: DataFrame, userCol: String, tsCol: String,
      periodDays: Int): DataFrame =
    graft.ops.Funnel.retentionCohorts(events, col(userCol), col(tsCol),
      periodDays)

  // ---- corpus reporting -----------------------------------------------

  def corpusDataCard(
      df: DataFrame, sourceCol: String, textCol: String): DataFrame =
    graft.ops.Report.corpusDataCard(df, col(sourceCol), col(textCol))

  def appendDataCardSegment(
      df: DataFrame, sourceCol: String, textCol: String, p: Int,
      dir: String, segmentId: String): Unit =
    graft.ops.Report.appendDataCardSegment(df, col(sourceCol), col(textCol),
      p, dir, segmentId)

  def readDataCard(spark: SparkSession, dir: String, p: Int): DataFrame =
    graft.ops.Report.readDataCard(spark, dir, p)

  // ---- HLL sketch segments --------------------------------------------

  def hllAppendRegistersSegment(
      items: DataFrame, itemCol: String, p: Int,
      dir: String, segmentId: String): Unit =
    graft.ops.Hll.appendRegistersSegment(items, col(itemCol), p, dir,
      segmentId)

  def hllReadRegisters(spark: SparkSession, dir: String, p: Int): DataFrame =
    graft.ops.Hll.readRegisters(spark, dir, p)

  def hllCompactRegistersSegments(
      spark: SparkSession, dir: String, p: Int): Int =
    graft.ops.Hll.compactRegistersSegments(spark, dir, p)
}
