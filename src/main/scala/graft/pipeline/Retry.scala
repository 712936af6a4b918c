package graft.pipeline

/** Retrying executor policy (SURVEY A33; reference:
  * app/service/request_executor.ts:40-45,49-159). The reference's
  * defaults: 10 attempts, 2 s delay, 60 s request timeout. Kept as a
  * plain function combinator — connectors ([[Downloader]],
  * [[graft.gitee.GiteeSource]]) wrap their injected fetchers with it;
  * no thread pool is needed because Spark's scheduler (or the driver
  * loop) owns concurrency.
  */
object Retry {

  final case class Policy(attempts: Int = 10, delayMillis: Long = 2000L)

  /** Retry `op` until it succeeds or attempts are exhausted (last
    * failure rethrown). `sleep` injectable for tests.
    */
  def apply[T](policy: Policy = Policy())(op: () => T)(
      implicit sleep: Long => Unit = Thread.sleep): T = {
    var last: Throwable = null
    var i = 0
    while (i < policy.attempts) {
      try return op()
      catch {
        case e: Throwable =>
          last = e
          i += 1
          if (i < policy.attempts) sleep(policy.delayMillis)
      }
    }
    throw last
  }

  /** Wrap a fetcher with the retry policy. */
  def fetcher[A, B](policy: Policy = Policy())(f: A => B)(
      implicit sleep: Long => Unit = Thread.sleep): A => B =
    a => apply(policy)(() => f(a))(sleep)
}
