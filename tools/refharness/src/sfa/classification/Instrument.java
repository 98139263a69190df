package sfa.classification;

// Instrumentation harness over the PUBLIC reference (patrickzib/SFA):
// dumps the BOSS-ensemble grid internals on a bundled UCR fixture so
// the PySpark port (sfa_spark/ml/grid.py) can be diffed cell-by-cell.
// Build: tools/refharness/build.sh; run:
//   java -cp ... sfa.classification.Instrument Beef [grid|eval]
// Output: TSV lines on stdout —
//   GRID <norm> <window> <f> <looCorrect>
//   MEMBER <norm> <window> <f> <trainCorrect>
//   NORM <norm> <voteTrainCorrect>
//   SCORE <trainAcc> <testAcc>

import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.BOSS;

import java.io.File;

public class Instrument {

  public static void main(String[] args) throws Exception {
    String dataset = args.length > 0 ? args[0] : "Beef";
    String mode = args.length > 1 ? args[1] : "eval";
    File train = new File(
        "/root/reference/src/main/resources/datasets/univariate/"
            + dataset + "/" + dataset + "_TRAIN");
    File test = new File(
        "/root/reference/src/main/resources/datasets/univariate/"
            + dataset + "/" + dataset + "_TEST");
    TimeSeries[] trainSamples = TimeSeriesLoader.loadDataset(train);
    TimeSeries[] testSamples = TimeSeriesLoader.loadDataset(test);
    Classifier.DEBUG = false;

    if (mode.equals("grid")) {
      dumpGrid(trainSamples);
    }

    if (mode.equals("fresh23")) {
      // FIRST thing in the JVM: the real fitEnsemble on full windows
      BOSSEnsembleClassifier c3 = new BOSSEnsembleClassifier();
      c3.generateIndices(trainSamples);
      int maxW = c3.getMax(trainSamples, BOSSEnsembleClassifier.MAX_WINDOW_LENGTH);
      Ensemble<BOSSEnsembleClassifier.BOSSModel> ens2 =
          c3.fitEnsemble(c3.getWindowsBetween(10, maxW), true, trainSamples);
      for (BOSSEnsembleClassifier.BOSSModel m : ens2.model) {
        System.out.println("FRESHENS\t" + m.windowLength + "\t" + m.features + "\t" + m.score.training);
      }
      System.exit(0);
    }

    if (mode.equals("w23")) {
      // bisect: the direct loop vs the real fitEnsemble on ONE window
      BOSSEnsembleClassifier c1 = new BOSSEnsembleClassifier();
      BOSS boss = new BOSS(BOSSEnsembleClassifier.maxF, BOSSEnsembleClassifier.maxS, 23, true);
      int[][] words = boss.createWords(trainSamples);
      for (int f = BOSSEnsembleClassifier.minF; f <= BOSSEnsembleClassifier.maxF; f += 2) {
        BOSS.BagOfPattern[] bag = boss.createBagOfPattern(words, trainSamples, f);
        Classifier.Predictions p = c1.predict(bag, bag);
        System.out.println("LOOP\t23\t" + f + "\t" + p.correct.get());
      }
      BOSSEnsembleClassifier c2 = new BOSSEnsembleClassifier();
      c2.generateIndices(trainSamples);
      Ensemble<BOSSEnsembleClassifier.BOSSModel> ens =
          c2.fitEnsemble(new Integer[]{23}, true, trainSamples);
      for (BOSSEnsembleClassifier.BOSSModel m : ens.model) {
        System.out.println("FITENS\t" + m.windowLength + "\t" + m.features + "\t" + m.score.training);
      }
      BOSSEnsembleClassifier c3 = new BOSSEnsembleClassifier();
      c3.generateIndices(trainSamples);
      int maxW = c3.getMax(trainSamples, BOSSEnsembleClassifier.MAX_WINDOW_LENGTH);
      Ensemble<BOSSEnsembleClassifier.BOSSModel> ens2 =
          c3.fitEnsemble(c3.getWindowsBetween(10, maxW), true, trainSamples);
      for (BOSSEnsembleClassifier.BOSSModel m : ens2.model) {
        System.out.println("FULLENS\t" + m.windowLength + "\t" + m.features + "\t" + m.score.training);
      }
      System.exit(0);
    }

    BOSSEnsembleClassifier c = new BOSSEnsembleClassifier();
    Classifier.Score score = c.eval(trainSamples, testSamples);
    Double[] preds = c.predict(testSamples);
    for (int i = 0; i < preds.length; i++) {
      System.out.println("PRED\t" + i + "\t" + preds[i] + "\t" + testSamples[i].getLabel());
    }
    for (BOSSEnsembleClassifier.BOSSModel m : c.model.model) {
      System.out.println(
          "MEMBER\t" + m.normed + "\t" + m.windowLength + "\t"
              + m.features + "\t" + m.score.training);
    }
    System.out.println(
        "SCORE\t" + score.getTrainingAccuracy() + "\t" + score.getTestingAccuracy());
    System.exit(0); // the ParallelFor pool is non-daemon; don't hang
  }

  /** The full (norm, window, f) LOO grid the ensemble fit scans —
   * replicated from BOSSEnsembleClassifier.fitEnsemble (java:126-181)
   * with the SAME BOSS words/bags/predict calls, singlethreaded so
   * every cell is printed (the fit only keeps per-window argmax). */
  static void dumpGrid(TimeSeries[] samples) throws Exception {
    BOSSEnsembleClassifier c = new BOSSEnsembleClassifier();
    int minWindowLength = 10;
    int maxWindowLength = c.getMax(samples, BOSSEnsembleClassifier.MAX_WINDOW_LENGTH);
    Integer[] windows = c.getWindowsBetween(minWindowLength, maxWindowLength);
    for (boolean normMean : new boolean[]{true, false}) {
      for (int w : windows) {
        BOSS boss = new BOSS(BOSSEnsembleClassifier.maxF, BOSSEnsembleClassifier.maxS, w, normMean);
        int[][] words = boss.createWords(samples);
        for (int f = BOSSEnsembleClassifier.minF; f <= BOSSEnsembleClassifier.maxF; f += 2) {
          BOSS.BagOfPattern[] bag = boss.createBagOfPattern(words, samples, f);
          Classifier.Predictions p = c.predict(bag, bag);
          System.out.println("GRID\t" + normMean + "\t" + w + "\t" + f + "\t" + p.correct.get());
        }
      }
    }
  }
}
