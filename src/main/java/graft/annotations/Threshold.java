package graft.annotations;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Retention cap: keep only the newest {@code value()} rows (by id
 * order), truncating the oldest on persist. Declared by the reference
 * (core/Threshold.java:38) and documented in its manual but never read
 * by the 2021.1 engine — SURVEY.md M3 commits to implementing it for
 * real, so here it is honored.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target(ElementType.TYPE)
public @interface Threshold {
  long value();
}
