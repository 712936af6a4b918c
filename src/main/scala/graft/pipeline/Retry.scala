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

  /** @param retryOn failures this returns false for abort the retry
    *                loop immediately (the reference's retryStrategy
    *                returning false, request_executor.ts:131-141) —
    *                used by [[rotatingFetcher]] to route proxy-caused
    *                failures to rotation instead of burning attempts
    */
  final case class Policy(attempts: Int = 10, delayMillis: Long = 2000L,
      retryOn: Throwable => Boolean = _ => true)

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
          if (!policy.retryOn(e)) throw e
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

  /** Rotating-proxy supplier (SURVEY A33's missing half; reference
    * `Proxy` interface, request_executor.ts:30-36 — `getProxy` +
    * `needRefreshProxy`). `acquire` yields the next endpoint;
    * `needsRotation` classifies a failure as proxy-caused (the
    * reference inspects err/body; here the fetcher surfaces that as
    * the exception it throws).
    */
  final case class ProxyPolicy[P](acquire: () => P,
      needsRotation: Throwable => Boolean, maxRotations: Int = 10)

  private final class ProxyFailure(cause: Throwable)
    extends RuntimeException(cause)

  /** Wrap a proxy-aware fetcher `(proxy, request) => response` into a
    * plain fetcher that retries transient failures under `retry` and
    * ROTATES the proxy on failures `proxies.needsRotation` classifies
    * as proxy-caused — mirroring the reference executor, a rotation
    * aborts the in-flight retry loop immediately (needRefreshProxy →
    * retryStrategy false, request_executor.ts:131-137) and re-issues
    * with a fresh endpoint (`getRequestInstance`, :108-117) WITHOUT
    * consuming retry budget; unlike the reference's unbounded
    * recursion, rotations are capped at `maxRotations`, then the
    * underlying failure propagates. The current endpoint is shared
    * across calls (one worker = one proxy until it goes bad, the
    * reference's thread model).
    */
  def rotatingFetcher[P, A, B](proxies: ProxyPolicy[P],
      retry: Policy = Policy())(f: (P, A) => B)(
      implicit sleep: Long => Unit = Thread.sleep): A => B = {
    val current =
      new java.util.concurrent.atomic.AtomicReference[P](proxies.acquire())
    val policy = retry.copy(retryOn = {
      case _: ProxyFailure => false
      case e => retry.retryOn(e)
    })
    a => {
      var rotations = 0
      var result: Option[B] = None
      while (result.isEmpty) {
        try result = Some(apply(policy)(() =>
          try f(current.get(), a)
          catch { case e if proxies.needsRotation(e) =>
            throw new ProxyFailure(e)
          })(sleep))
        catch {
          case pf: ProxyFailure =>
            rotations += 1
            if (rotations > proxies.maxRotations) throw pf.getCause
            current.set(proxies.acquire())
        }
      }
      result.get
    }
  }
}
