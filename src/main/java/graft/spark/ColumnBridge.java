package graft.spark;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.classic.ExpressionUtils;

/**
 * Bridge between the public {@link Column} API and Catalyst
 * {@link Expression}s, for wiring custom codegen'd expressions (e.g.
 * {@code graft.functions.QuantizedDot}) into DataFrame plans.
 *
 * Spark 4 moved Column onto ColumnNode and scopes the converters
 * {@code private[sql]}; those Scala access modifiers are not present in
 * bytecode, so this Java shim can forward to them directly without
 * placing any graft code inside Spark's namespace.
 */
public final class ColumnBridge {
    private ColumnBridge() {}

    /** Wrap a Catalyst expression as a user-facing Column. */
    public static Column column(Expression e) {
        return ExpressionUtils.column(e);
    }

    /** Unwrap a Column to its Catalyst expression. */
    public static Expression expression(Column c) {
        return ExpressionUtils.expression(c);
    }
}
