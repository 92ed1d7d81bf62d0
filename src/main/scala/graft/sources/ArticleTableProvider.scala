package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the ingestion edge (SURVEY.md §2.1 S1-S3):
  * the reference's per-outlet scraper loop (get_news.py link-page →
  * article fetches) as a first-class Spark batch source —
  *
  *   spark.read.format("graft-articles")
  *     .option("outlets", "globalnews|https://g/politics,cbc|https://c/n")
  *     .option("linkre", "href")          // or "rss"
  *     .option("narticles", "10") ...
  *
  * One InputPartition PER OUTLET — the planner's unit of parallelism
  * matches the reference's `max_active_tasks` outlet concurrency
  * (ingest_news.py:84), and a slow outlet stalls only its own task.
  * Column pruning is pushed into the reader: a `select(source_name,
  * url)` plan (link audit) never materializes article bodies.
  *
  * Link extraction inside the reader mirrors `ArticleSources
  * .extractLinks` (same regexes, absolutize, keyword filter,
  * order-preserving dedup, head-n) — agreement between this source and
  * the DataFrame pipeline on one fixture is spec-asserted
  * (ArticleSourcesSpec). Fetching goes through the same `Fetcher`
  * seam: this zero-egress container wires fixture pages via
  * `page.<url>` options; production swaps an HTTP fetcher resolved
  * from the options (e.g. a class name), one instance per partition.
  */
class ArticleTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-articles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArticleTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArticleTable(properties.asScala.toMap)
}

object ArticleTableProvider {
  val Schema: StructType = StructType(Seq(
    StructField("source_name", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

private[sources] class ArticleTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = "graft_articles"
  override def schema(): StructType = ArticleTableProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    // props (original-case keys) carry the fixture page URLs; the
    // case-insensitive map would have lowercased them
    new ArticleScanBuilder(props)
}

private[sources] class ArticleScanBuilder(props: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ArticleTableProvider.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order; an empty prune (count(*)) is legal
    required = StructType(ArticleTableProvider.Schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ArticleScan(props, required)
}

private[sources] case class OutletPartition(sourceName: String,
    pageUrl: String) extends InputPartition

private[sources] class ArticleScan(props: Map[String, String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    props.getOrElse("outlets", "").split(",").filter(_.nonEmpty)
      .map { spec =>
        val Array(nm, url) = spec.split("\\|", 2)
        OutletPartition(nm, url): InputPartition
      }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArticleReaderFactory(props, required.fieldNames)
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new ArticleMicroBatchStream(props, required.fieldNames)
}

/** Offset = number of completed scrape rounds. */
private[sources] case class ScrapeOffset(round: Long) extends Offset {
  override def json(): String = round.toString
}

/** Streaming form of the source: the reference's cron re-scrape
  * (`schedule_interval=3h`, ingest_news.py:83) modeled honestly — each
  * micro-batch trigger IS one scrape round over every outlet, and the
  * checkpointed offset counts completed rounds, so a restarted query
  * resumes scraping instead of replaying. Rows re-fetched in later
  * rounds are the same articles until the outlet pages change (exactly
  * like the reference), which is why the pipeline's next stage is the
  * watermarked streaming dedup (NewsStream.dedupedIngest). Pair with
  * `Trigger.ProcessingTime("3 hours")` for the reference's cadence. */
private[sources] class ArticleMicroBatchStream(props: Map[String, String],
    required: Array[String])
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ScrapeOffset(0L)
  // admission-control form: the engine hands us the checkpointed start
  // offset, so "one more scrape round" needs no instance state and
  // restarts resume correctly (the plain latestOffset() has no way to
  // see the restored offset before its first call)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    ScrapeOffset(start.asInstanceOf[ScrapeOffset].round + 1)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "use latestOffset(start, limit) — SupportsAdmissionControl")
  override def deserializeOffset(json: String): Offset =
    ScrapeOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ScrapeOffset].round
    val to = end.asInstanceOf[ScrapeOffset].round
    val outlets = props.getOrElse("outlets", "").split(",")
      .filter(_.nonEmpty).map { spec =>
        val Array(nm, url) = spec.split("\\|", 2)
        (nm, url)
      }
    // one partition per (outlet, round) — a backlogged restart scrapes
    // each missed round, preserving per-round batch identity
    (for {
      _ <- (from + 1) to to
      (nm, url) <- outlets
    } yield OutletPartition(nm, url): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArticleReaderFactory(props, required)
}

private[sources] class ArticleReaderFactory(props: Map[String, String],
    required: Array[String]) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OutletPartition]
    new ArticleReader(p, props, required)
  }
}

private[sources] class ArticleReader(p: OutletPartition,
    props: Map[String, String], required: Array[String])
  extends PartitionReader[InternalRow] {
  import graft.news.ArticleSources.{HrefRe, RssLinkRe}

  private val fetcher = new graft.news.MapFetcher(
    props.collect { case (k, v) if k.startsWith("page.") =>
      k.stripPrefix("page.") -> v })
  private val linkRe =
    (if (props.getOrElse("linkre", "href") == "rss") RssLinkRe
     else HrefRe).r
  private val baseUrl = props.getOrElse("baseurl", "")
  private val keyword = props.get("keyword")
  private val n = props.getOrElse("narticles", "10").toInt

  // S1/S2 in the reader: extract → absolutize → keyword filter →
  // order-preserving dedup → head-n (lockstep with extractLinks)
  private val links: Iterator[String] = fetcher.fetch(p.pageUrl) match {
    case None => Iterator.empty
    case Some(body) =>
      val raw = linkRe.findAllMatchIn(body).map(_.group(1))
        .map(l => if (l.startsWith("http")) l else baseUrl + l)
        .filter(l => keyword.forall(l.contains))
      raw.foldLeft(Vector.empty[String]) { (acc, l) =>
        if (acc.contains(l) || acc.size >= n) acc else acc :+ l
      }.iterator
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && links.hasNext) {
      val url = links.next()
      fetcher.fetch(url).foreach { body => // fetch failure drops the row
        current = InternalRow.fromSeq(required.map {
          case "source_name" => UTF8String.fromString(p.sourceName)
          case "url" => UTF8String.fromString(url)
          case "body" => UTF8String.fromString(body)
        }.toIndexedSeq)
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
