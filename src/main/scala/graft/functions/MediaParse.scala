package graft.functions

/** Shared hardening for the in-repo media parsers: corrupt or truncated
  * payloads must surface as a NAMED parse diagnostic, never a raw index
  * error that kills a task without context. */
private[functions] object MediaParse {
  def wrapCorrupt[T](format: String, len: Int)(body: => T): T =
    try body
    catch {
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException) =>
        throw new IllegalArgumentException(
          s"truncated or corrupt $format ($len bytes): " +
            s"${e.getClass.getSimpleName}${Option(e.getMessage).fold("")(m => s" ($m)")}", e)
    }
}
