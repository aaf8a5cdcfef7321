package graft.pipeline

/** Bounded retry with exponential backoff — the Spring `@Retryable`
  * analogue every external call site in the reference declares (SQS:
  * SQSMessagingService.kt:16-19, SNS: SnsServiceImpl.kt:18-21,
  * DynamoDB: DynamoDBProductStatusService.kt:18-21, HTTP key service:
  * HttpKeyService.kt:37-40 — all maxAttempts 5, delay 1000 ms,
  * multiplier 2). The sleeper is injectable so tests count attempts
  * without wall-clock waits.
  */
object Retry {

  final case class Policy(maxAttempts: Int = 5, delayMs: Long = 1000L,
      multiplier: Double = 2.0)

  /** Runs `op`, retrying on exceptions matching `retryOn` (default:
    * all) up to `policy.maxAttempts` total attempts with exponentially
    * growing delays; rethrows the last (or first non-retryable)
    * failure — Spring's `@Retryable(value = [...])` semantics. */
  def withRetry[A](policy: Policy, sleeper: Long => Unit = Thread.sleep,
      retryOn: Exception => Boolean = _ => true)(op: => A): A = {
    var attempt = 1
    var delay = policy.delayMs
    var result: Option[A] = None
    while (result.isEmpty) {
      try result = Some(op)
      catch {
        case e: Exception =>
          if (!retryOn(e) || attempt >= policy.maxAttempts) throw e
          sleeper(delay)
          delay = (delay * policy.multiplier).toLong
          attempt += 1
      }
    }
    result.get
  }
}
