package graft.annotations;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Marks an entity class as non-distributed (reference:
 * core/NoDistribute.java, read in persistent/Table.java:259-271
 * isDistributed — the table's frames stay node-local instead of being
 * replicated across cluster nodes). The Spark rendering: persist
 * batches for the table are coalesced to a single output file per
 * commit — the layout a small dimension table wants (one
 * broadcast-friendly file instead of one shard per executor, no
 * small-file sprawl from frequent tiny persists). Distribution of
 * reads still belongs to Spark; this shapes only the written layout.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target(ElementType.TYPE)
public @interface NoDistribute {}
