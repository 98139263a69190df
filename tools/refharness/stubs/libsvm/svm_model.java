package libsvm;

public class svm_model implements java.io.Serializable {
  public svm_parameter param;
}
