package graft.sources

import java.io.InputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.DurationLong
import scala.util.{Failure, Success, Try}

/** Acquisition layer (SURVEY §2.1 S1-S5): retry/backoff combinator,
  * thread-pool fan-out with all-or-any success semantics, HTTP/FTP drivers.
  *
  * Driver-side by design — downloads are I/O plumbing that land files in an
  * input directory for the manifest scan; Spark never sees this layer.
  */
object Extract {

  /** S2 — retry with backoff (extractor.py:186-346): exponential
    * (`b·2^(n-1)`) or linear (`n·b`, the S3 variant extractor.py:568-574).
    * `ignorable` exceptions retry; anything else is fatal and rethrows. */
  def retryWithBackoff[T](
      maxRetries: Int = 5,
      backoffSeconds: Double = 1.0,
      linear: Boolean = false,
      ignorable: Throwable => Boolean = _ => true,
      sleeper: Long => Unit = Thread.sleep)(op: () => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      Try(op()) match {
        case Success(v) => return v
        case Failure(e) if attempt < maxRetries && ignorable(e) =>
          last = e
          attempt += 1
          val delay =
            if (linear) attempt * backoffSeconds
            else backoffSeconds * math.pow(2.0, (attempt - 1).toDouble)
          sleeper((delay * 1000).toLong)
        case Failure(e) => throw e
      }
    }
    throw last
  }

  /** S1 — bounded fan-out over download jobs (extractor.py:50-124,
    * concurrency 8). Returns per-job results; `acceptAnySuccess` mirrors the
    * reference's any-vs-all semantics. */
  def pool[T](jobs: Seq[() => T], concurrency: Int = 8,
      acceptAnySuccess: Boolean = false): Seq[Try[T]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, concurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futures = jobs.map(j => Future(Try(j())))
      val results = Await.result(Future.sequence(futures), 24.hours)
      val ok = if (acceptAnySuccess) results.exists(_.isSuccess)
               else results.forall(_.isSuccess)
      if (!ok) throw results.collectFirst { case Failure(e) => e }
        .getOrElse(new RuntimeException("extraction pool failed"))
      results
    } finally pool.shutdown()
  }

  /** S3 — scrape `<a href>` links from an HTML index page, filter and
    * absolutize (extractor.py:422-475). */
  def getLinks(html: String, baseUrl: String,
      keep: String => Boolean = _ => true): Seq[String] = {
    val href = "(?i)<a\\s+[^>]*href=[\"']([^\"'#]+)[\"']".r
    href.findAllMatchIn(html).map(_.group(1)).toSeq
      .filter(keep)
      .map(h => URI.create(baseUrl + "/").resolve(h).toString)
      .distinct
  }

  /** S4 — sessioned HTTP GET with status-code retries (500/502/503/504) and
    * ignorable status codes, writing to a local path
    * (extractor.py:349-560). */
  final case class RetryableStatus(code: Int)
    extends RuntimeException(s"HTTP $code")

  final class HttpExtractor(
      retries: Int = 5,
      backoffSeconds: Double = 1.0,
      retryStatusCodes: Set[Int] = Set(500, 502, 503, 504),
      ignorableStatusCodes: Set[Int] = Set.empty,
      sleeper: Long => Unit = Thread.sleep) {

    private val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(30))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    def fetchString(url: String): Option[String] =
      fetch(url, HttpResponse.BodyHandlers.ofString()).map(_.body())

    /** Download to `dest`; returns false for ignorable status codes. */
    def download(url: String, dest: Path): Boolean = {
      Files.createDirectories(dest.getParent)
      fetch(url, HttpResponse.BodyHandlers.ofInputStream()).exists { resp =>
        val in: InputStream = resp.body()
        try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        true
      }
    }

    private def fetch[T](url: String,
        handler: HttpResponse.BodyHandler[T]): Option[HttpResponse[T]] =
      retryWithBackoff(retries, backoffSeconds, linear = false,
        ignorable = _.isInstanceOf[RetryableStatus], sleeper = sleeper) { () =>
        val resp = client.send(
          HttpRequest.newBuilder(URI.create(url)).GET().build(), handler)
        resp.statusCode() match {
          case ok if ok < 400 => Some(resp)
          case ig if ignorableStatusCodes.contains(ig) => None
          case retry if retryStatusCodes.contains(retry) => throw RetryableStatus(retry)
          case fatal => throw new RuntimeException(s"HTTP $fatal for $url")
        }
      }
  }

  /** S5 — anonymous FTP via the JDK's ftp: URL handler (extractor.py:749-939):
    * downloads stream per URL (one connection each, like the reference's
    * per-request connects); directory listings come from the handler's
    * NLST stream on a directory URL, and `find` filters them by regex
    * (extractor.py:904-921's ftp.nlst + re.search). */
  final class FtpExtractor(retries: Int = 5, backoffSeconds: Double = 1.0,
      sleeper: Long => Unit = Thread.sleep) {

    /** Names in the cwd listing. The RFC 1738 `;type=d` typecode makes the
      * JDK ftp handler issue NLST (name list); without it some servers fall
      * back to LIST long-format rows, so each line is defensively reduced
      * to its last whitespace token (the filename in both formats), then to
      * a basename like the reference's nlst view. */
    def listDirectory(dirUrl: String): Seq[String] =
      retryWithBackoff(retries, backoffSeconds, sleeper = sleeper) { () =>
        val base = if (dirUrl.endsWith("/")) dirUrl else dirUrl + "/"
        val in = URI.create(base + ";type=d").toURL.openStream()
        try scala.io.Source.fromInputStream(in).getLines()
          .flatMap(Extract.listingName).toList
        finally in.close()
      }

    /** S5 `find`: listing entries matching `pattern`. `lister` is
      * injectable for offline tests (and for servers whose LIST format
      * needs custom parsing). */
    def find(dirUrl: String, pattern: scala.util.matching.Regex,
        lister: String => Seq[String] = listDirectory): Seq[String] =
      lister(dirUrl).filter(n => pattern.findFirstIn(n).isDefined)
    def download(url: String, dest: Path): Unit = {
      Files.createDirectories(dest.getParent)
      retryWithBackoff(retries, backoffSeconds, sleeper = sleeper) { () =>
        val in = URI.create(url).toURL.openStream()
        try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
      }
    }
  }

  /** Batch download into an input directory (the extract→manifest handoff):
    * each job lands `<inputDir>/<fileName(url)>`. `acceptAnySuccess = true`
    * keeps partial batches (one bad URL doesn't abort the rest); the
    * default all-or-nothing mirrors the reference's strict pool. */
  def batchDownload(urls: Seq[String], inputDir: String,
      fetchOne: (String, Path) => Unit, concurrency: Int = 8,
      acceptAnySuccess: Boolean = false): Seq[Try[Path]] = {
    val dir = Paths.get(inputDir)
    Files.createDirectories(dir)
    pool(urls.map { url => () =>
      val dest = dir.resolve(Paths.get(URI.create(url).getPath).getFileName.toString)
      fetchOne(url, dest)
      dest
    }, concurrency, acceptAnySuccess)
  }

  /** Normalize one FTP listing line to a filename: NLST emits bare names
    * or full paths; servers falling back to LIST emit long-format rows
    * ("-rw-r--r-- 1 ftp ftp 123 Jan 01 name.nc") whose filename is the
    * last whitespace token. Dotted self/parent entries drop. */
  private[sources] def listingName(line: String): Option[String] = {
    val t = line.trim
    if (t.isEmpty) None
    else {
      val tok = t.substring(t.lastIndexWhere(_.isWhitespace) + 1)
      val base = tok.substring(tok.lastIndexOf('/') + 1)
      if (base.nonEmpty && base != "." && base != "..") Some(base) else None
    }
  }
}
