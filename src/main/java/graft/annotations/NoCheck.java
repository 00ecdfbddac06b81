package graft.annotations;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Marks the entity's id field as check-free: persist skips the
 * existence lookup and appends directly — the hot-ingest fast path for
 * insert-only tables (event logs, CEP input), where paying an
 * existence anti-join per batch buys nothing (reference:
 * core/NoCheck.java; persistent/Table.java:577-584 isIdFieldNoCheck,
 * :1209 — a no-check table passes a null chunk straight to insert).
 * The caller owns id uniqueness; duplicate ids become duplicate rows.
 * On a Scala case class annotate the constructor param with
 * {@code @(NoCheck @field)} alongside the id annotation.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.FIELD, ElementType.PARAMETER})
public @interface NoCheck {}
