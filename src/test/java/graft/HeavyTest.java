package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for long-running verification suites (multi-minute
 * differential oracles over the sf fixtures). The default `sbt test`
 * excludes them so the whole suite fits the verification harness's
 * budget (VERDICT r19 next #2: the r19 test run was truncated mid-suite
 * at the budget with zero failing assertions); run everything with
 * GRAFT_HEAVY_TESTS=1 sbt test — see build.sbt.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.TYPE, ElementType.METHOD})
public @interface HeavyTest {}
