package graft.annotations;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Marks the entity's key field (reference: JPA @Id read by
 * persistent/Table.java:409-428 at registerTable). On a Scala case
 * class annotate the constructor param with {@code @(Id @field)} so the
 * annotation lands on the backing field.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.FIELD, ElementType.PARAMETER})
public @interface Id {}
