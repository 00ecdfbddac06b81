package graft.annotations;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Key field whose values the engine generates cluster-uniquely when the
 * persisted object carries 0 (reference: core/DistributedId.java:39 —
 * per-node id ranges; manual "@DistributedId annotation"). Spark
 * mapping: offset + monotonically_increasing_id(), which encodes the
 * partition ordinal in the high bits — unique across executors without
 * coordination, strictly greater than every existing id.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.FIELD, ElementType.PARAMETER})
public @interface DistributedId {}
